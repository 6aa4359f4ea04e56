m = 517,n = 302,nz = 4531
iterations = 267
objective  = 1.0312116e+07
golden     = 1.0312116e+07
seconds    = 29.946
optimal solution 
