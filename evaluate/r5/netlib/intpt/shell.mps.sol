m = 537,n = 1775,nz = 4900
iterations = 133
objective  = 1.2088254e+09
golden     = 1.2088253e+09
seconds    = 24.469
optimal solution 
