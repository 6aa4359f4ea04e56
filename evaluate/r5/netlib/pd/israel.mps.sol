m = 175,n = 142,nz = 2358
iterations = 191
objective  = -8.9664482e+05
golden     = -8.9664482e+05
seconds    = 6.57
optimal solution 
