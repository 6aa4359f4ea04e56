m = 118,n = 111,nz = 474
iterations = 27
objective  = -4.1131976e+04
golden     = -4.1131976e+04
seconds    = 72.589
optimal solution 
