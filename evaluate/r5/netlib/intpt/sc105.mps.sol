m = 106,n = 103,nz = 281
iterations = 37
objective  = -5.2202061e+01
golden     = -5.2202061e+01
seconds    = 6.835
optimal solution 
