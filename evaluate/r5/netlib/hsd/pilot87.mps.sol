m = 2031,n = 4883,nz = 73804
iterations = 40
objective  = 3.0171035e+02
golden     = 3.0171073e+02
seconds    = 38.938
optimal solution 
