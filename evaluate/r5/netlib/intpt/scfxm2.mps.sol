m = 661,n = 914,nz = 5229
iterations = 240
objective  = 3.2213603e+07
golden     = 3.6660262e+04
seconds    = 92.46
primal infeasible 
