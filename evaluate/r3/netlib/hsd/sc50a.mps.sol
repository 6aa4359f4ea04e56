m = 51,n = 48,nz = 131
iterations = 18
objective  = -6.4575077e+01
golden     = -6.4575077e+01
seconds    = 0.292
optimal solution 
