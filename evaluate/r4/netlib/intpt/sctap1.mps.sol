m = 301,n = 480,nz = 2052
iterations = 0
objective  = nan
golden     = 1.4122500e+03
seconds    = 277.725
error 
