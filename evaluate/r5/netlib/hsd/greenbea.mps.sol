m = 2393,n = 5405,nz = 31499
iterations = 66
objective  = -7.2462621e+07
golden     = -7.2462406e+07
seconds    = 667.203
suboptimal solution 
