m = 517,n = 302,nz = 4531
iterations = 76
objective  = 1.3507519e+08
golden     = 1.0312116e+07
seconds    = 13.541
dual infeasible 
