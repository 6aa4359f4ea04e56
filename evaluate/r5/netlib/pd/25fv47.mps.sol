m = 822,n = 1571,nz = 11127
iterations = 5792
objective  = 5.5018459e+03
golden     = 5.5018459e+03
seconds    = 319.538
optimal solution 
