m = 148,n = 1350,nz = 5666
iterations = 32
objective  = 5.0500002e+01
golden     = 5.0500000e+01
seconds    = 47.364
optimal solution 
