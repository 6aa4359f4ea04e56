m = 301,n = 645,nz = 5665
iterations = 1074
objective  = -1.0687094e+08
golden     = -1.0687094e+08
seconds    = 151.877
optimal solution 
