m = 411,n = 1000,nz = 5145
iterations = 145
objective  = -2.5811392e+03
golden     = -2.5811393e+03
seconds    = 94.06
optimal solution 
