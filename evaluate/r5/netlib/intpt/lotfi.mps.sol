m = 154,n = 308,nz = 1086
iterations = 62
objective  = -2.5264706e+01
golden     = -2.5264706e+01
seconds    = 6.835
optimal solution 
