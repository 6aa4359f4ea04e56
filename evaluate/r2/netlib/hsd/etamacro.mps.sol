m = 401,n = 688,nz = 2489
iterations = 100
objective  = -7.5571523e+02
golden     = -7.5571522e+02
seconds    = 117.419
optimal solution 
