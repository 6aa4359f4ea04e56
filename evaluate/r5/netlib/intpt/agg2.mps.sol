m = 517,n = 302,nz = 4515
iterations = 78
objective  = 5.0177915e+07
golden     = -2.0239252e+07
seconds    = 13.55
dual infeasible 
