m = 398,n = 2750,nz = 11334
iterations = 28
objective  = 9.0500001e+02
golden     = 9.0500000e+02
seconds    = 48.771
optimal solution 
