m = 1504,n = 1818,nz = 26230
iterations = 0
objective  = nan
golden     = -9.8729400e+02
seconds    = 0.93
error 
