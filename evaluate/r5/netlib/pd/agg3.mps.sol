m = 517,n = 302,nz = 4531
iterations = 0
objective  = nan
golden     = 1.0312116e+07
seconds    = 217.1
error 
