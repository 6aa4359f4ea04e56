m = 847,n = 1443,nz = 10006
iterations = 2428
objective  = -5.8063744e+04
golden     = -5.8063744e+04
seconds    = 131.709
optimal solution 
