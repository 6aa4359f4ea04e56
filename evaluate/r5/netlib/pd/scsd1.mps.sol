m = 78,n = 760,nz = 3148
iterations = 137
objective  = 8.6666667e+00
golden     = 8.6666667e+00
seconds    = 38.74
optimal solution 
