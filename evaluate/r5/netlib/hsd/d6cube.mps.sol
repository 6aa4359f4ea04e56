m = 416,n = 6184,nz = 43888
iterations = 26
objective  = 3.1549167e+02
golden     = 3.1549167e+02
seconds    = 12.706
optimal solution 
