m = 78,n = 760,nz = 3148
iterations = 27
objective  = 8.6666671e+00
golden     = 8.6666667e+00
seconds    = 41.303
optimal solution 
