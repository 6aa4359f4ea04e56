m = 44,n = 41,nz = 291
iterations = 0
objective  = nan
golden     = -1.7499001e+03
seconds    = 277.643
error 
