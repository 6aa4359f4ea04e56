m = 92,n = 180,nz = 752
iterations = 0
objective  = nan
golden     = -2.6661600e+02
seconds    = 277.685
error 
