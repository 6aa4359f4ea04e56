m = 334,n = 587,nz = 4523
iterations = 29
objective  = 2.9214776e-01
golden     = 2.9214777e-01
seconds    = 18.201
optimal solution 
