m = 401,n = 688,nz = 2489
iterations = 2791
objective  = -7.5571523e+02
golden     = -7.5571522e+02
seconds    = 183.974
optimal solution 
