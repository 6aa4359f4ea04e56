m = 847,n = 1443,nz = 10006
iterations = 72
objective  = -5.8063741e+04
golden     = -5.8063744e+04
seconds    = 42.046
optimal solution 
