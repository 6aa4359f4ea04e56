m = 141,n = 301,nz = 2633
iterations = 143
objective  = -4.7728060e+07
golden     = -4.7787812e+07
seconds    = 14.584
dual infeasible 
