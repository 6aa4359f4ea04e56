m = 445,n = 534,nz = 4449
iterations = 2484
objective  = -1.4351780e+03
golden     = -1.4351780e+03
seconds    = 102.147
optimal solution 
