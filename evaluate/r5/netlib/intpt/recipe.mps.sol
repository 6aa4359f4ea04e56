m = 92,n = 180,nz = 752
iterations = 50
objective  = -2.6661600e+02
golden     = -2.6661600e+02
seconds    = 6.835
optimal solution 
