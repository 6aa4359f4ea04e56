m = 2158,n = 2031,nz = 9492
iterations = 0
objective  = nan
golden     = -3.9024409e+04
seconds    = 220.766
error 
