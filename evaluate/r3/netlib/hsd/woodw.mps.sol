m = 1099,n = 8405,nz = 37478
iterations = 0
objective  = nan
golden     = 1.3044763e+00
seconds    = 5.946
error 
