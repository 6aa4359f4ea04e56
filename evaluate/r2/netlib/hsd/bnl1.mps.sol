m = 644,n = 1175,nz = 6129
iterations = 114
objective  = 1.9776296e+03
golden     = 1.9776293e+03
seconds    = 12.106
optimal solution 
