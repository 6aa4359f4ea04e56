m = 174,n = 262,nz = 3476
iterations = 41
objective  = 3.3592487e+04
golden     = 3.3592486e+04
seconds    = 6.835
optimal solution 
