m = 199,n = 203,nz = 914
iterations = 54
objective  = 1.2983146e+05
golden     = 1.2983146e+05
seconds    = 6.835
optimal solution 
