m = 51,n = 48,nz = 119
iterations = 18
objective  = -7.0000000e+01
golden     = -7.0000000e+01
seconds    = 0.319
optimal solution 
