m = 2426,n = 3602,nz = 8404
iterations = 0
objective  = nan
golden     = -6.7952044e+08
seconds    = 156.792
error 
