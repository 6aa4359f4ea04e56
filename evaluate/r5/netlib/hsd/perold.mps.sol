m = 626,n = 1376,nz = 6026
iterations = 163
objective  = -9.3807551e+03
golden     = -9.3807581e+03
seconds    = 158.462
optimal solution 
