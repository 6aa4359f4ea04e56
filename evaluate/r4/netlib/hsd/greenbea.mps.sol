m = 2393,n = 5405,nz = 31499
iterations = 0
objective  = nan
golden     = -7.2462406e+07
seconds    = 242.816
error 
