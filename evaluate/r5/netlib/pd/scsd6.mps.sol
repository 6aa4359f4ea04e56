m = 148,n = 1350,nz = 5666
iterations = 330
objective  = 5.0500000e+01
golden     = 5.0500000e+01
seconds    = 29.296
optimal solution 
