m = 78,n = 760,nz = 3148
iterations = 16
objective  = 8.6666667e+00
golden     = 8.6666667e+00
seconds    = 7.008
optimal solution 
