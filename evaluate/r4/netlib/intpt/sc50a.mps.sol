m = 51,n = 48,nz = 131
iterations = 0
objective  = nan
golden     = -6.4575077e+01
seconds    = 277.63
error 
