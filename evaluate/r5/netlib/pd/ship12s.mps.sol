m = 1152,n = 2763,nz = 10941
iterations = 1388
objective  = 1.4892361e+06
golden     = 1.4892361e+06
seconds    = 214.734
optimal solution 
