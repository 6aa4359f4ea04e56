m = 351,n = 384,nz = 3865
iterations = 82
objective  = -3.3521357e+02
golden     = -3.3521357e+02
seconds    = 4.771
optimal solution 
