m = 306,n = 472,nz = 2659
iterations = 22
objective  = -1.5862802e+02
golden     = -1.5862802e+02
seconds    = 6.712
optimal solution 
