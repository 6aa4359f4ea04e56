m = 468,n = 1075,nz = 3686
iterations = 334
objective  = 1.4060175e+03
golden     = 1.4060175e+03
seconds    = 32.777
optimal solution 
