m = 221,n = 249,nz = 2150
iterations = 23
objective  = 1.5185099e+03
golden     = 1.5185099e+03
seconds    = 3.927
optimal solution 
