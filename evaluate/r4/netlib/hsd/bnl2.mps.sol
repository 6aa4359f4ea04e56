m = 2325,n = 3489,nz = 16124
iterations = 40
objective  = 1.8112367e+03
golden     = 1.8112365e+03
seconds    = 547.687
suboptimal solution 
