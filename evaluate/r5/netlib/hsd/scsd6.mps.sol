m = 148,n = 1350,nz = 5666
iterations = 20
objective  = 5.0500000e+01
golden     = 5.0500000e+01
seconds    = 7.346
optimal solution 
