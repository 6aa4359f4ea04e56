m = 517,n = 302,nz = 4515
iterations = 270
objective  = -2.0239252e+07
golden     = -2.0239252e+07
seconds    = 38.891
optimal solution 
