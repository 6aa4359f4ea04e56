m = 1310,n = 1681,nz = 7021
iterations = 37
objective  = -1.0822912e+05
golden     = -1.0958636e+05
seconds    = 74.119
dual infeasible 
