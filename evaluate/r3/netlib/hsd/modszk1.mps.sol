m = 688,n = 1620,nz = 4158
iterations = 31
objective  = 3.2047425e+02
golden     = 3.2061973e+02
seconds    = 31.047
optimal solution 
