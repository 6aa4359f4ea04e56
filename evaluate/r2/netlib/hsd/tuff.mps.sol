m = 334,n = 587,nz = 4523
iterations = 70
objective  = 2.9214785e-01
golden     = 2.9214777e-01
seconds    = 7.798
optimal solution 
