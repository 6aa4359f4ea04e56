m = 51,n = 48,nz = 131
iterations = 32
objective  = -6.4575077e+01
golden     = -6.4575077e+01
seconds    = 6.835
optimal solution 
