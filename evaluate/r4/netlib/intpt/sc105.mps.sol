m = 106,n = 103,nz = 281
iterations = 0
objective  = nan
golden     = -5.2202061e+01
seconds    = 277.637
error 
