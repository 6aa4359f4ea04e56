m = 2158,n = 2031,nz = 9492
iterations = 30
objective  = -3.9024409e+04
golden     = -3.9024409e+04
seconds    = 41.58
optimal solution 
