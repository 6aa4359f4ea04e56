m = 167,n = 143,nz = 1339
iterations = 22
objective  = -3.1501873e+02
golden     = -3.1501873e+02
seconds    = 3.927
optimal solution 
