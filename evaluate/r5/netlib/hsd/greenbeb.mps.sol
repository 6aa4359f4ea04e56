m = 2393,n = 5405,nz = 31499
iterations = 61
objective  = -4.3022603e+06
golden     = -4.3021476e+06
seconds    = 42.019
optimal solution 
