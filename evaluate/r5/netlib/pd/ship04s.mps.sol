m = 403,n = 1458,nz = 5810
iterations = 576
objective  = 1.7987147e+06
golden     = 1.7987147e+06
seconds    = 32.777
optimal solution 
