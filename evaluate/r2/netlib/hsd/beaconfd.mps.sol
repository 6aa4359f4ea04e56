m = 174,n = 262,nz = 3476
iterations = 38
objective  = 3.3592486e+04
golden     = 3.3592486e+04
seconds    = 2.704
optimal solution 
