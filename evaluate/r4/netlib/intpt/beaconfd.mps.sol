m = 174,n = 262,nz = 3476
iterations = 0
objective  = nan
golden     = 3.3592486e+04
seconds    = 277.751
error 
