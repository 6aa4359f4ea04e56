m = 688,n = 1620,nz = 4158
iterations = 86
objective  = 2.8672546e+02
golden     = 3.2061973e+02
seconds    = 24.469
dual infeasible 
