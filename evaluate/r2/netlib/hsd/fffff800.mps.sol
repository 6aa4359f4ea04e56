m = 525,n = 854,nz = 6235
iterations = 96
objective  = 5.5567957e+05
golden     = 5.5567961e+05
seconds    = 13.279
optimal solution 
