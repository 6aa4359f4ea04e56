m = 331,n = 457,nz = 2612
iterations = 0
objective  = nan
golden     = 1.8416759e+04
seconds    = 217.055
error 
