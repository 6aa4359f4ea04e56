m = 411,n = 1000,nz = 5145
iterations = 3050
objective  = -2.5811393e+03
golden     = -2.5811393e+03
seconds    = 36.915
optimal solution 
