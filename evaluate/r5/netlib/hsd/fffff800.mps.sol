m = 525,n = 854,nz = 6235
iterations = 46
objective  = 5.5567956e+05
golden     = 5.5567961e+05
seconds    = 18.201
optimal solution 
