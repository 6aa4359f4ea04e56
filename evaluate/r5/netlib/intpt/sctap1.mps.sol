m = 301,n = 480,nz = 2052
iterations = 54
objective  = 1.4122500e+03
golden     = 1.4122500e+03
seconds    = 6.835
optimal solution 
