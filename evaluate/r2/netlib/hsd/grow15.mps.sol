m = 301,n = 645,nz = 5665
iterations = 52
objective  = -1.0687093e+08
golden     = -1.0687094e+08
seconds    = 7.382
optimal solution 
