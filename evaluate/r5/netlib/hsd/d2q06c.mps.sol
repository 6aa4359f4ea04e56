m = 2172,n = 5167,nz = 35674
iterations = 34
objective  = 1.2278421e+05
golden     = 1.2278424e+05
seconds    = 44.74
optimal solution 
