m = 25,n = 1026,nz = 14430
iterations = 54
objective  = -9.1463781e+03
golden     = -9.1463781e+03
seconds    = 9.099
optimal solution 
