m = 75,n = 83,nz = 521
iterations = 40
objective  = -3.0812150e+01
golden     = -3.0812150e+01
seconds    = 6.835
optimal solution 
