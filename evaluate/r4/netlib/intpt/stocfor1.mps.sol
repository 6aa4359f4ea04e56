m = 118,n = 111,nz = 474
iterations = 0
objective  = nan
golden     = -4.1131976e+04
seconds    = 277.657
error 
