m = 245,n = 2594,nz = 70216
iterations = 28
objective  = 1.4429024e+00
golden     = 1.4429024e+00
seconds    = 10.598
optimal solution 
