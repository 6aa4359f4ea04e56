m = 351,n = 384,nz = 3865
iterations = 728
objective  = -3.3521357e+02
golden     = -3.3521357e+02
seconds    = 43.739
optimal solution 
