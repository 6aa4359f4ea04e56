m = 991,n = 1371,nz = 7846
iterations = 270
objective  = 4.1737712e+04
golden     = 5.4901255e+04
seconds    = 85.454
dual infeasible 
