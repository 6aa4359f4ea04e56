m = 331,n = 457,nz = 2612
iterations = 604
objective  = 1.8416759e+04
golden     = 1.8416759e+04
seconds    = 24.207
optimal solution 
