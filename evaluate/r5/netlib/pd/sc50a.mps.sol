m = 51,n = 48,nz = 131
iterations = 46
objective  = -6.4575077e+01
golden     = -6.4575077e+01
seconds    = 6.57
optimal solution 
