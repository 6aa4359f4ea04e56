m = 644,n = 1175,nz = 6129
iterations = 2996
objective  = 1.9776296e+03
golden     = 1.9776293e+03
seconds    = 36.596
optimal solution 
