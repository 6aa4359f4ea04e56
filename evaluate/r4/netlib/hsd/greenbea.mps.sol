m = 2393,n = 5405,nz = 31499
iterations = 101
objective  = -7.2555399e+07
golden     = -7.2462406e+07
seconds    = 1039.029
suboptimal solution 
