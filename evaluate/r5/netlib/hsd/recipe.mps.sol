m = 92,n = 180,nz = 752
iterations = 16
objective  = -2.6661600e+02
golden     = -2.6661600e+02
seconds    = 3.066
optimal solution 
