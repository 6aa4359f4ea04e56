m = 234,n = 315,nz = 1525
iterations = 184
objective  = 1.3730804e+03
golden     = 1.3730804e+03
seconds    = 6.57
optimal solution 
