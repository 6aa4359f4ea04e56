m = 2426,n = 3602,nz = 8404
iterations = 27
objective  = -6.7952044e+08
golden     = -6.7952044e+08
seconds    = 37.544
optimal solution 
