m = 1228,n = 2036,nz = 9252
iterations = 25
objective  = 1.5394362e+07
golden     = 1.5394362e+07
seconds    = 31.227
optimal solution 
