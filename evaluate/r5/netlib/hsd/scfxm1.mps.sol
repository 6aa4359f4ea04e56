m = 331,n = 457,nz = 2612
iterations = 23
objective  = 1.8416759e+04
golden     = 1.8416759e+04
seconds    = 6.712
optimal solution 
