m = 626,n = 1376,nz = 6026
iterations = 56
objective  = -9.3807673e+03
golden     = -9.3807581e+03
seconds    = 127.088
suboptimal solution 
