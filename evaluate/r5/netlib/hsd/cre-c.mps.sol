m = 3068,n = 3678,nz = 13244
iterations = 32
objective  = 2.5275116e+07
golden     = 2.5275116e+07
seconds    = 28.06
optimal solution 
