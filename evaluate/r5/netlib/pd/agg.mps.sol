m = 489,n = 163,nz = 2541
iterations = 182
objective  = -3.5991767e+07
golden     = -3.5991767e+07
seconds    = 74.81
optimal solution 
