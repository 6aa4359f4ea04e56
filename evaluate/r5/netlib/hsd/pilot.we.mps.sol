m = 723,n = 2789,nz = 9218
iterations = 99
objective  = -2.7201075e+06
golden     = -2.7201027e+06
seconds    = 100.647
optimal solution 
