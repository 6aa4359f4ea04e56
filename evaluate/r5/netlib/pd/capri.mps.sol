m = 272,n = 353,nz = 1786
iterations = 0
objective  = nan
golden     = 2.6900129e+03
seconds    = 217.029
error 
