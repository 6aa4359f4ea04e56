m = 154,n = 308,nz = 1086
iterations = 0
objective  = nan
golden     = -2.5264706e+01
seconds    = 277.697
error 
