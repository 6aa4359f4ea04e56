m = 537,n = 1775,nz = 4900
iterations = 1235
objective  = 1.2088253e+09
golden     = 1.2088253e+09
seconds    = 142.571
optimal solution 
