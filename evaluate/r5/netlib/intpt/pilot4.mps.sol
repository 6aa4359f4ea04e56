m = 411,n = 1000,nz = 5145
iterations = 400
objective  = -3.6049906e-21
golden     = -2.5811393e+03
seconds    = 73.385
iteration limit 
