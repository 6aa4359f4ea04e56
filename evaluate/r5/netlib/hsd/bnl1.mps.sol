m = 644,n = 1175,nz = 6129
iterations = 62
objective  = 1.9776291e+03
golden     = 1.9776293e+03
seconds    = 4.499
optimal solution 
