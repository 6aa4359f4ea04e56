m = 517,n = 302,nz = 4515
iterations = 0
objective  = nan
golden     = -2.0239252e+07
seconds    = 217.093
error 
