m = 688,n = 1620,nz = 4158
iterations = 84
objective  = 3.2056951e+02
golden     = 3.2061973e+02
seconds    = 26.698
optimal solution 
