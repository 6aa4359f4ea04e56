m = 1904,n = 2857,nz = 21322
iterations = 0
objective  = nan
golden     = -5.2263930e+00
seconds    = 4.301
error 
