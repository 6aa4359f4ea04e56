m = 472,n = 500,nz = 2029
iterations = 29
objective  = -1.4753433e+07
golden     = -1.4753433e+07
seconds    = 6.712
optimal solution 
