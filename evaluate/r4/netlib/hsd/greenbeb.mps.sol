m = 2393,n = 5405,nz = 31499
iterations = 62
objective  = -4.3022603e+06
golden     = -4.3021476e+06
seconds    = 182.958
optimal solution 
