m = 162,n = 421,nz = 4916
iterations = 327
objective  = -6.6421896e+02
golden     = -6.6421874e+02
seconds    = 6.57
optimal solution 
