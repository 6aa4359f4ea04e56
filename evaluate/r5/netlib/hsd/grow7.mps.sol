m = 141,n = 301,nz = 2633
iterations = 34
objective  = -4.7787812e+07
golden     = -4.7787812e+07
seconds    = 3.066
optimal solution 
