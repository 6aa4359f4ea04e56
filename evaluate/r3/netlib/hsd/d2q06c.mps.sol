m = 2172,n = 5167,nz = 35674
iterations = 0
objective  = nan
golden     = 1.2278424e+05
seconds    = 18.07
error 
