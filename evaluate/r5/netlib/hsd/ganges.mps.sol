m = 1310,n = 1681,nz = 7021
iterations = 28
objective  = -1.0958574e+05
golden     = -1.0958636e+05
seconds    = 15.573
optimal solution 
