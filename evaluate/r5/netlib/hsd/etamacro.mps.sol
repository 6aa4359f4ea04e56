m = 401,n = 688,nz = 2489
iterations = 30
objective  = -7.5571521e+02
golden     = -7.5571522e+02
seconds    = 9.74
optimal solution 
