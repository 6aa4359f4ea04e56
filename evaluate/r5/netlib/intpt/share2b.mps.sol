m = 97,n = 79,nz = 730
iterations = 39
objective  = -4.1573224e+02
golden     = -4.1573224e+02
seconds    = 6.835
optimal solution 
