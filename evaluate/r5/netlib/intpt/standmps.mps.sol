m = 468,n = 1075,nz = 3686
iterations = 103
objective  = 1.4060176e+03
golden     = 1.4060175e+03
seconds    = 19.002
optimal solution 
