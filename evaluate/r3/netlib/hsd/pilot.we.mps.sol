m = 723,n = 2789,nz = 9218
iterations = 44
objective  = -2.7201076e+06
golden     = -2.7201027e+06
seconds    = 97.593
optimal solution 
