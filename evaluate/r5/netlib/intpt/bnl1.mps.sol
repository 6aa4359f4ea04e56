m = 644,n = 1175,nz = 6129
iterations = 208
objective  = 1.9776008e+03
golden     = 1.9776293e+03
seconds    = 21.779
optimal solution 
