m = 92,n = 180,nz = 752
iterations = 88
objective  = -2.6661600e+02
golden     = -2.6661600e+02
seconds    = 6.57
optimal solution 
