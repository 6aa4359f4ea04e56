m = 401,n = 688,nz = 2489
iterations = 69
objective  = -7.5571513e+02
golden     = -7.5571522e+02
seconds    = 11.704
optimal solution 
