m = 1310,n = 1681,nz = 7021
iterations = 2000
objective  = -1.0958574e+05
golden     = -1.0958636e+05
seconds    = 267.456
iteration limit 
