m = 1099,n = 8405,nz = 37478
iterations = 47
objective  = 1.3044763e+00
golden     = 1.3044763e+00
seconds    = 30.044
optimal solution 
