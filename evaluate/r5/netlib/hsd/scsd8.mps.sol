m = 398,n = 2750,nz = 11334
iterations = 18
objective  = 9.0500000e+02
golden     = 9.0500000e+02
seconds    = 23.393
optimal solution 
