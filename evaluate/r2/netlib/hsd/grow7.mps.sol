m = 141,n = 301,nz = 2633
iterations = 50
objective  = -4.7787811e+07
golden     = -4.7787812e+07
seconds    = 3.42
optimal solution 
