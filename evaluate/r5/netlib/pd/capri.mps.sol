m = 272,n = 353,nz = 1786
iterations = 429
objective  = 2.6900129e+03
golden     = 2.6900129e+03
seconds    = 20.096
optimal solution 
