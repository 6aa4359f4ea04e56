m = 516,n = 1028,nz = 4874
iterations = 1549
objective  = 1.5711600e+04
golden     = 1.5711600e+04
seconds    = 122.004
optimal solution 
