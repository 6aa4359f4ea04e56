m = 663,n = 2923,nz = 13988
iterations = 41
objective  = 1.4076036e+07
golden     = 1.4076073e+07
seconds    = 19.324
optimal solution 
