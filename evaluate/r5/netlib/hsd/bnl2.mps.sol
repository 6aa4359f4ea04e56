m = 2325,n = 3489,nz = 16124
iterations = 41
objective  = 1.8112369e+03
golden     = 1.8112365e+03
seconds    = 248.055
suboptimal solution 
