m = 1091,n = 1880,nz = 8124
iterations = 52
objective  = 1.7248072e+03
golden     = 1.7248071e+03
seconds    = 27.15
optimal solution 
