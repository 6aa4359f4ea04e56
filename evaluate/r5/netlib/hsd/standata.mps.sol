m = 360,n = 1075,nz = 3038
iterations = 24
objective  = 1.2576996e+03
golden     = 1.2576995e+03
seconds    = 31.426
optimal solution 
