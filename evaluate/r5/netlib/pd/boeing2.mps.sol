m = 167,n = 143,nz = 1339
iterations = 157
objective  = -3.1501873e+02
golden     = -3.1501873e+02
seconds    = 6.57
optimal solution 
