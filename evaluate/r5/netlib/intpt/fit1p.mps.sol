m = 628,n = 1677,nz = 10894
iterations = 56
objective  = 9.1463781e+03
golden     = 9.1463781e+03
seconds    = 27.15
optimal solution 
