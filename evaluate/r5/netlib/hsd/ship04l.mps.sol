m = 403,n = 2118,nz = 8450
iterations = 22
objective  = 1.7933245e+06
golden     = 1.7933245e+06
seconds    = 11.077
optimal solution 
