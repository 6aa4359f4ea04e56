m = 97,n = 79,nz = 730
iterations = 136
objective  = -4.1573224e+02
golden     = -4.1573224e+02
seconds    = 6.57
optimal solution 
