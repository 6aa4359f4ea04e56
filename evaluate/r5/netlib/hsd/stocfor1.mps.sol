m = 118,n = 111,nz = 474
iterations = 19
objective  = -4.1131976e+04
golden     = -4.1131976e+04
seconds    = 3.927
optimal solution 
