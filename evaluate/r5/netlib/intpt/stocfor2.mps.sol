m = 2158,n = 2031,nz = 9492
iterations = 37
objective  = -3.1966219e+04
golden     = -3.9024409e+04
seconds    = 77.259
dual infeasible 
