m = 537,n = 1775,nz = 4900
iterations = 25
objective  = 1.2088253e+09
golden     = 1.2088253e+09
seconds    = 35.945
optimal solution 
