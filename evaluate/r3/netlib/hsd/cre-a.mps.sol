m = 3516,n = 4067,nz = 14987
iterations = 32
objective  = 2.3595407e+07
golden     = 2.3595407e+07
seconds    = 130.325
optimal solution 
