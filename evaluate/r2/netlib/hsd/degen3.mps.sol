m = 1504,n = 1818,nz = 26230
iterations = 46
objective  = -9.8729400e+02
golden     = -9.8729400e+02
seconds    = 8.232
optimal solution 
