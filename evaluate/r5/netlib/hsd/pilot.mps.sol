m = 1442,n = 3652,nz = 43220
iterations = 51
objective  = -5.5748973e+02
golden     = -5.5748973e+02
seconds    = 25.971
optimal solution 
