m = 57,n = 97,nz = 465
iterations = 0
objective  = nan
golden     = 2.2549496e+05
seconds    = 277.65
error 
