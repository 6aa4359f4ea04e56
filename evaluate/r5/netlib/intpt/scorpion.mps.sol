m = 389,n = 358,nz = 1708
iterations = 68
objective  = 1.8781950e+03
golden     = 1.8781248e+03
seconds    = 45.49
dual infeasible 
