m = 2426,n = 3602,nz = 8404
iterations = 53
objective  = -6.7952044e+08
golden     = -6.7952044e+08
seconds    = 116.969
optimal solution 
