m = 991,n = 1371,nz = 7846
iterations = 2323
objective  = 5.4901255e+04
golden     = 5.4901255e+04
seconds    = 191.791
optimal solution 
