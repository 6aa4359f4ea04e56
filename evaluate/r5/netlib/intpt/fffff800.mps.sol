m = 525,n = 854,nz = 6235
iterations = 137
objective  = 5.5567959e+05
golden     = 5.5567961e+05
seconds    = 11.704
optimal solution 
