m = 411,n = 1000,nz = 5145
iterations = 0
objective  = nan
golden     = -2.5811393e+03
seconds    = 51.629
error 
