m = 1904,n = 2857,nz = 21322
iterations = 33
objective  = -5.2263930e+00
golden     = -5.2263930e+00
seconds    = 101.772
optimal solution 
