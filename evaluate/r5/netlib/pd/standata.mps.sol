m = 360,n = 1075,nz = 3038
iterations = 75
objective  = 1.2576995e+03
golden     = 1.2576995e+03
seconds    = 32.777
optimal solution 
