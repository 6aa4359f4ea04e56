m = 25,n = 1026,nz = 14430
iterations = 24
objective  = -9.1463781e+03
golden     = -9.1463781e+03
seconds    = 12.053
optimal solution 
