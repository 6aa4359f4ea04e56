m = 154,n = 308,nz = 1086
iterations = 22
objective  = -2.5264706e+01
golden     = -2.5264706e+01
seconds    = 3.927
optimal solution 
