m = 118,n = 111,nz = 474
iterations = 43
objective  = -4.1131976e+04
golden     = -4.1131976e+04
seconds    = 6.835
optimal solution 
