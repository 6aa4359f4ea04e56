m = 491,n = 1169,nz = 4029
iterations = 91
objective  = 9.0429697e+02
golden     = 9.0429999e+02
seconds    = 19.002
optimal solution 
