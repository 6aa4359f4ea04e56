m = 489,n = 163,nz = 2541
iterations = 76
objective  = 4.3463799e+07
golden     = -3.5991767e+07
seconds    = 52.634
dual infeasible 
