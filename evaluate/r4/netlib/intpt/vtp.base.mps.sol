m = 199,n = 203,nz = 914
iterations = 0
objective  = nan
golden     = 1.2983146e+05
seconds    = 277.691
error 
