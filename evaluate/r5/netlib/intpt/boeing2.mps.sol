m = 167,n = 143,nz = 1339
iterations = 74
objective  = -3.1501872e+02
golden     = -3.1501873e+02
seconds    = 6.835
optimal solution 
