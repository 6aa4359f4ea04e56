m = 723,n = 2789,nz = 9218
iterations = 200
objective  = -1.0550378e+05
golden     = -2.7201027e+06
seconds    = 100.002
iteration limit 
