m = 723,n = 2789,nz = 9218
iterations = 3357
objective  = -2.7201077e+06
golden     = -2.7201027e+06
seconds    = 223.535
optimal solution 
