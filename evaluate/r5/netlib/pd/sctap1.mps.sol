m = 301,n = 480,nz = 2052
iterations = 465
objective  = 1.4122500e+03
golden     = 1.4122500e+03
seconds    = 6.57
optimal solution 
