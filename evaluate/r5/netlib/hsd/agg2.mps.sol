m = 517,n = 302,nz = 4515
iterations = 25
objective  = -2.0239238e+07
golden     = -2.0239252e+07
seconds    = 6.712
optimal solution 
