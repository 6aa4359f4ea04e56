m = 334,n = 587,nz = 4523
iterations = 364
objective  = 2.9214777e-01
golden     = 2.9214777e-01
seconds    = 99.088
optimal solution 
