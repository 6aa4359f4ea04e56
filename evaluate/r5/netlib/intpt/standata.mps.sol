m = 360,n = 1075,nz = 3038
iterations = 79
objective  = 1.2576999e+03
golden     = 1.2576995e+03
seconds    = 19.002
optimal solution 
