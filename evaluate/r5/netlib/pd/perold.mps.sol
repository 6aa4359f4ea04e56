m = 626,n = 1376,nz = 6026
iterations = 3649
objective  = -9.3807553e+03
golden     = -9.3807581e+03
seconds    = 141.486
optimal solution 
