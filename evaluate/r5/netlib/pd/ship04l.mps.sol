m = 403,n = 2118,nz = 8450
iterations = 604
objective  = 1.7933245e+06
golden     = 1.7933245e+06
seconds    = 69.209
optimal solution 
