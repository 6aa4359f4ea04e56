m = 626,n = 1376,nz = 6026
iterations = 116
objective  = -9.3807550e+03
golden     = -9.3807581e+03
seconds    = 45.955
optimal solution 
