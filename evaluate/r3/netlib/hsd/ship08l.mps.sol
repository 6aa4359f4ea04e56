m = 779,n = 4283,nz = 17085
iterations = 0
objective  = nan
golden     = 1.9090552e+06
seconds    = 12.558
error 
