m = 661,n = 914,nz = 5229
iterations = 1671
objective  = 3.6660262e+04
golden     = 3.6660262e+04
seconds    = 307.712
optimal solution 
