m = 221,n = 249,nz = 2150
iterations = 29
objective  = 1.5190455e+03
golden     = 1.5185099e+03
seconds    = 7.971
optimal solution 
