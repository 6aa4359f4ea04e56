m = 234,n = 315,nz = 1525
iterations = 62
objective  = 1.3730804e+03
golden     = 1.3730804e+03
seconds    = 54.591
optimal solution 
