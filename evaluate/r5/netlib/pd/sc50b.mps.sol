m = 51,n = 48,nz = 119
iterations = 58
objective  = -7.0000000e+01
golden     = -7.0000000e+01
seconds    = 6.57
optimal solution 
