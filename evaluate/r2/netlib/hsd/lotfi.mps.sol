m = 154,n = 308,nz = 1086
iterations = 56
objective  = -2.5264693e+01
golden     = -2.5264706e+01
seconds    = 30.977
optimal solution 
