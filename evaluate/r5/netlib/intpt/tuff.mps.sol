m = 334,n = 587,nz = 4523
iterations = 81
objective  = 2.9214777e-01
golden     = 2.9214777e-01
seconds    = 11.704
optimal solution 
