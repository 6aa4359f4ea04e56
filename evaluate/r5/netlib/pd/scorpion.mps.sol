m = 389,n = 358,nz = 1708
iterations = 440
objective  = 1.8781248e+03
golden     = 1.8781248e+03
seconds    = 73.98
optimal solution 
