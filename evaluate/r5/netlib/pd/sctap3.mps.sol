m = 1481,n = 2480,nz = 10734
iterations = 1158
objective  = 1.4240000e+03
golden     = 1.4240000e+03
seconds    = 215.373
optimal solution 
