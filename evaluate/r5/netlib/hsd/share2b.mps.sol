m = 97,n = 79,nz = 730
iterations = 25
objective  = -4.1573224e+02
golden     = -4.1573224e+02
seconds    = 3.927
optimal solution 
