m = 206,n = 203,nz = 552
iterations = 0
objective  = nan
golden     = -5.2202061e+01
seconds    = 277.668
error 
