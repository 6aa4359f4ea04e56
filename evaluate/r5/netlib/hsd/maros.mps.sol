m = 847,n = 1443,nz = 10006
iterations = 26
objective  = -5.8063744e+04
golden     = -5.8063744e+04
seconds    = 79.34
optimal solution 
