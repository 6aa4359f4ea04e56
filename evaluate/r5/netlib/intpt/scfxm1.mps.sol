m = 331,n = 457,nz = 2612
iterations = 187
objective  = 1.2414586e+05
golden     = 1.8416759e+04
seconds    = 13.541
dual infeasible 
