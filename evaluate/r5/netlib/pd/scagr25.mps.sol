m = 472,n = 500,nz = 2029
iterations = 0
objective  = nan
golden     = -1.4753433e+07
seconds    = 211.556
error 
