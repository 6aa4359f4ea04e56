m = 847,n = 1443,nz = 10006
iterations = 100
objective  = -5.8063743e+04
golden     = -5.8063744e+04
seconds    = 20.418
optimal solution 
