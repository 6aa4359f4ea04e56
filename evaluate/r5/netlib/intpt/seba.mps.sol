m = 516,n = 1028,nz = 4874
iterations = 56
objective  = 1.5711600e+04
golden     = 1.5711600e+04
seconds    = 42.046
optimal solution 
