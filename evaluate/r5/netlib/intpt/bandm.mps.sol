m = 306,n = 472,nz = 2659
iterations = 135
objective  = 1.4050585e+02
golden     = -1.5862802e+02
seconds    = 13.829
primal infeasible 
