m = 175,n = 142,nz = 2358
iterations = 0
objective  = nan
golden     = -8.9664482e+05
seconds    = 277.738
error 
