m = 2031,n = 4883,nz = 73804
iterations = 0
objective  = nan
golden     = 3.0171073e+02
seconds    = 0.238
error 
