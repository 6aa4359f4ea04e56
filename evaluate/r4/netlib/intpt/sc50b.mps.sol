m = 51,n = 48,nz = 119
iterations = 0
objective  = nan
golden     = -7.0000000e+01
seconds    = 277.622
error 
