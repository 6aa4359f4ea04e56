m = 306,n = 472,nz = 2659
iterations = 1486
objective  = -1.5862802e+02
golden     = -1.5862802e+02
seconds    = 27.326
optimal solution 
