m = 272,n = 353,nz = 1786
iterations = 184
objective  = 1.1119674e+07
golden     = 2.6900129e+03
seconds    = 13.038
primal infeasible 
