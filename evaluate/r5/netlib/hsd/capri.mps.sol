m = 272,n = 353,nz = 1786
iterations = 32
objective  = 2.6900129e+03
golden     = 2.6900129e+03
seconds    = 6.712
optimal solution 
