m = 162,n = 421,nz = 4916
iterations = 0
objective  = nan
golden     = -6.6421874e+02
seconds    = 277.758
error 
