m = 9881,n = 28655,nz = 62524
iterations = 0
objective  = nan
golden     = 2.7761038e+10
seconds    = 571.603
error 
