m = 97,n = 79,nz = 730
iterations = 54
objective  = -4.1573224e+02
golden     = -4.1573224e+02
seconds    = 1.923
optimal solution 
