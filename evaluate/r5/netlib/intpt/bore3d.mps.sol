m = 234,n = 315,nz = 1525
iterations = 65
objective  = 1.3730804e+03
golden     = 1.3730804e+03
seconds    = 6.835
optimal solution 
