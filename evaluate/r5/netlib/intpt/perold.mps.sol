m = 626,n = 1376,nz = 6026
iterations = 400
objective  = -4.7207429e+03
golden     = -9.3807581e+03
seconds    = 124.38
iteration limit 
