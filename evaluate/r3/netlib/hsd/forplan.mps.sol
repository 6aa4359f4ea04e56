m = 162,n = 421,nz = 4916
iterations = 28
objective  = -6.6421896e+02
golden     = -6.6421874e+02
seconds    = 58.915
optimal solution 
