m = 930,n = 3523,nz = 14173
iterations = 29
objective  = 2.1851967e+06
golden     = 2.1851967e+06
seconds    = 19.245
optimal solution 
