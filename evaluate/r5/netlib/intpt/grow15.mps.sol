m = 301,n = 645,nz = 5665
iterations = 266
objective  = -9.5903636e+07
golden     = -1.0687094e+08
seconds    = 54.512
primal infeasible 
