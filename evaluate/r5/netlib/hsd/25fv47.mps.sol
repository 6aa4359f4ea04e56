m = 822,n = 1571,nz = 11127
iterations = 31
objective  = 5.5018459e+03
golden     = 5.5018459e+03
seconds    = 73.255
optimal solution 
