m = 516,n = 1028,nz = 4874
iterations = 29
objective  = 1.5711600e+04
golden     = 1.5711600e+04
seconds    = 5.265
optimal solution 
