m = 389,n = 358,nz = 1708
iterations = 18
objective  = 1.8781248e+03
golden     = 1.8781248e+03
seconds    = 6.712
optimal solution 
