m = 351,n = 384,nz = 3865
iterations = 115
objective  = -3.3348506e+02
golden     = -3.3521357e+02
seconds    = 13.779
dual infeasible 
