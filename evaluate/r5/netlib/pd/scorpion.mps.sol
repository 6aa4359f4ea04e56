m = 389,n = 358,nz = 1708
iterations = 0
objective  = nan
golden     = 1.8781248e+03
seconds    = 217.017
error 
