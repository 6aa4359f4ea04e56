m = 489,n = 163,nz = 2541
iterations = 26
objective  = -3.5991761e+07
golden     = -3.5991767e+07
seconds    = 6.712
optimal solution 
