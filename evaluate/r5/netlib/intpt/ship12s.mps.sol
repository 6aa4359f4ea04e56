m = 1152,n = 2763,nz = 10941
iterations = 124
objective  = 1.4892362e+06
golden     = 1.4892361e+06
seconds    = 76.019
optimal solution 
