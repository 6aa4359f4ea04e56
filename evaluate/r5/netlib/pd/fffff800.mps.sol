m = 525,n = 854,nz = 6235
iterations = 1015
objective  = 5.5567956e+05
golden     = 5.5567961e+05
seconds    = 99.088
optimal solution 
