m = 723,n = 2789,nz = 9218
iterations = 102
objective  = -2.7201075e+06
golden     = -2.7201027e+06
seconds    = 122.901
optimal solution 
