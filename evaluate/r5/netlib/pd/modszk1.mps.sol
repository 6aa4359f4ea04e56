m = 688,n = 1620,nz = 4158
iterations = 4766
objective  = 3.2061973e+02
golden     = 3.2061973e+02
seconds    = 182.591
optimal solution 
