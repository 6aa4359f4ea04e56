m = 154,n = 308,nz = 1086
iterations = 546
objective  = -2.5264706e+01
golden     = -2.5264706e+01
seconds    = 6.57
optimal solution 
