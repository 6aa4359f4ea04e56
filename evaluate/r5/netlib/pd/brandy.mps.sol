m = 221,n = 249,nz = 2150
iterations = 483
objective  = 1.5185099e+03
golden     = 1.5185099e+03
seconds    = 6.57
optimal solution 
