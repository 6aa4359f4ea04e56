m = 472,n = 500,nz = 2029
iterations = 130
objective  = -1.4518457e+07
golden     = -1.4753433e+07
seconds    = 13.489
dual infeasible 
