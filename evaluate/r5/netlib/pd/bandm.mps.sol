m = 306,n = 472,nz = 2659
iterations = 0
objective  = nan
golden     = -1.5862802e+02
seconds    = 217.073
error 
