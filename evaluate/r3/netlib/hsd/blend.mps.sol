m = 75,n = 83,nz = 521
iterations = 21
objective  = -3.0812150e+01
golden     = -3.0812150e+01
seconds    = 0.351
optimal solution 
