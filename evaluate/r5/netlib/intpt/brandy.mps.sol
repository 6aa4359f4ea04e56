m = 221,n = 249,nz = 2150
iterations = 220
objective  = 1.1653551e+04
golden     = 1.5185099e+03
seconds    = 54.201
dual infeasible 
