m = 1228,n = 2036,nz = 9252
iterations = 30
objective  = 1.2608266e+08
golden     = 1.5394362e+07
seconds    = 75.12
dual infeasible 
