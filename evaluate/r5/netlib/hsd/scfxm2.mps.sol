m = 661,n = 914,nz = 5229
iterations = 25
objective  = 3.6660262e+04
golden     = 3.6660262e+04
seconds    = 7.958
optimal solution 
