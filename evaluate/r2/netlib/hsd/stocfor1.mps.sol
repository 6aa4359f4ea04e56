m = 118,n = 111,nz = 474
iterations = 46
objective  = -4.1131976e+04
golden     = -4.1131976e+04
seconds    = 1.676
optimal solution 
