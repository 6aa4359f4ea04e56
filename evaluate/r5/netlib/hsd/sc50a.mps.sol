m = 51,n = 48,nz = 131
iterations = 16
objective  = -6.4575077e+01
golden     = -6.4575077e+01
seconds    = 3.927
optimal solution 
