m = 1228,n = 2036,nz = 9252
iterations = 790
objective  = 1.5394362e+07
golden     = 1.5394362e+07
seconds    = 359.87
optimal solution 
