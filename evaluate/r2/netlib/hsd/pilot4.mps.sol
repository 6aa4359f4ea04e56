m = 411,n = 1000,nz = 5145
iterations = 106
objective  = -2.5811388e+03
golden     = -2.5811393e+03
seconds    = 19.39
optimal solution 
