m = 51,n = 48,nz = 119
iterations = 29
objective  = -7.0000000e+01
golden     = -7.0000000e+01
seconds    = 6.835
optimal solution 
