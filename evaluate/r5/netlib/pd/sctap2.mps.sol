m = 1091,n = 1880,nz = 8124
iterations = 1254
objective  = 1.7248071e+03
golden     = 1.7248071e+03
seconds    = 109.744
optimal solution 
