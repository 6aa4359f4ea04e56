m = 661,n = 914,nz = 5229
iterations = 26
objective  = 3.6660262e+04
golden     = 3.6660262e+04
seconds    = 46.171
optimal solution 
