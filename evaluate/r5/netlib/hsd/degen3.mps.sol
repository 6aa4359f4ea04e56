m = 1504,n = 1818,nz = 26230
iterations = 21
objective  = -9.8729400e+02
golden     = -9.8729400e+02
seconds    = 17.582
optimal solution 
