m = 57,n = 97,nz = 465
iterations = 39
objective  = 2.2549496e+05
golden     = 2.2549496e+05
seconds    = 6.835
optimal solution 
