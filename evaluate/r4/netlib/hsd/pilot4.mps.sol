m = 411,n = 1000,nz = 5145
iterations = 98
objective  = -2.5811391e+03
golden     = -2.5811393e+03
seconds    = 60.907
optimal solution 
