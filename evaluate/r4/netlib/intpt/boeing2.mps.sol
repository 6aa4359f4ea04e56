m = 167,n = 143,nz = 1339
iterations = 0
objective  = nan
golden     = -3.1501873e+02
seconds    = 277.712
error 
