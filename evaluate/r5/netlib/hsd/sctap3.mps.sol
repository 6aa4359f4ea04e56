m = 1481,n = 2480,nz = 10734
iterations = 21
objective  = 1.4240000e+03
golden     = 1.4240000e+03
seconds    = 17.864
optimal solution 
