m = 517,n = 302,nz = 4531
iterations = 26
objective  = 1.0312117e+07
golden     = 1.0312116e+07
seconds    = 6.712
optimal solution 
