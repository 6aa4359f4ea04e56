m = 403,n = 2118,nz = 8450
iterations = 99
objective  = 1.7933246e+06
golden     = 1.7933245e+06
seconds    = 48.966
optimal solution 
