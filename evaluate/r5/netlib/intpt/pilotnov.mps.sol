m = 976,n = 2172,nz = 13129
iterations = 75
objective  = -4.4972762e+03
golden     = -4.4972762e+03
seconds    = 5.729
optimal solution 
