m = 779,n = 4283,nz = 17085
iterations = 23
objective  = 1.9090552e+06
golden     = 1.9090552e+06
seconds    = 23.128
optimal solution 
