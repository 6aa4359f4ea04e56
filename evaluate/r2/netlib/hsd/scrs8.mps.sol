m = 491,n = 1169,nz = 4029
iterations = 78
objective  = 9.0429696e+02
golden     = 9.0429999e+02
seconds    = 5.848
optimal solution 
