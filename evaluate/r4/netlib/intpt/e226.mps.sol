m = 224,n = 282,nz = 2767
iterations = 0
objective  = nan
golden     = -1.8751929e+01
seconds    = 277.745
error 
