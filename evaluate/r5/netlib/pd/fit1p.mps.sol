m = 628,n = 1677,nz = 10894
iterations = 1985
objective  = 9.1463781e+03
golden     = 9.1463781e+03
seconds    = 127.356
optimal solution 
