m = 472,n = 500,nz = 2029
iterations = 0
objective  = nan
golden     = -1.4753433e+07
seconds    = 217.038
error 
