m = 468,n = 1075,nz = 3686
iterations = 33
objective  = 1.4060175e+03
golden     = 1.4060175e+03
seconds    = 31.426
optimal solution 
