m = 162,n = 421,nz = 4916
iterations = 28
objective  = -6.6421887e+02
golden     = -6.6421874e+02
seconds    = 3.066
optimal solution 
