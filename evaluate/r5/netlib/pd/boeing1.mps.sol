m = 351,n = 384,nz = 3865
iterations = 0
objective  = nan
golden     = -3.3521357e+02
seconds    = 217.086
error 
