m = 162,n = 421,nz = 4916
iterations = 76
objective  = -6.6368616e+02
golden     = -6.6421874e+02
seconds    = 6.682
optimal solution 
