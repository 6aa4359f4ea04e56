m = 472,n = 500,nz = 2029
iterations = 1252
objective  = -1.4753433e+07
golden     = -1.4753433e+07
seconds    = 22.545
optimal solution 
