m = 3516,n = 4067,nz = 14987
iterations = 31
objective  = 2.3595407e+07
golden     = 2.3595407e+07
seconds    = 35.961
optimal solution 
