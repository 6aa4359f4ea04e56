m = 661,n = 914,nz = 5229
iterations = 96
objective  = 3.6660262e+04
golden     = 3.6660262e+04
seconds    = 131.562
optimal solution 
