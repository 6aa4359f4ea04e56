m = 118,n = 111,nz = 474
iterations = 140
objective  = -4.1131976e+04
golden     = -4.1131976e+04
seconds    = 6.57
optimal solution 
