m = 174,n = 262,nz = 3476
iterations = 18
objective  = 3.3592486e+04
golden     = 3.3592486e+04
seconds    = 3.927
optimal solution 
