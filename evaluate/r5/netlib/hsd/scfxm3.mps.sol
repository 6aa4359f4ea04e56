m = 991,n = 1371,nz = 7846
iterations = 25
objective  = 5.4901255e+04
golden     = 5.4901255e+04
seconds    = 65.47
optimal solution 
