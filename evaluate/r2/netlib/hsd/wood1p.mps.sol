m = 245,n = 2594,nz = 70216
iterations = 0
objective  = nan
golden     = 1.4429024e+00
seconds    = 0.079
error 
