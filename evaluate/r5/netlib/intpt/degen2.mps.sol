m = 445,n = 534,nz = 4449
iterations = 42
objective  = -1.4351780e+03
golden     = -1.4351780e+03
seconds    = 11.704
optimal solution 
