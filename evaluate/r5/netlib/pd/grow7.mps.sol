m = 141,n = 301,nz = 2633
iterations = 282
objective  = -4.7787812e+07
golden     = -4.7787812e+07
seconds    = 19.559
optimal solution 
