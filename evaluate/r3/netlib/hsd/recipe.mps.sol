m = 92,n = 180,nz = 752
iterations = 17
objective  = -2.6661600e+02
golden     = -2.6661600e+02
seconds    = 54.457
optimal solution 
