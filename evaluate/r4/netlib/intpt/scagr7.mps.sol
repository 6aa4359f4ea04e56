m = 130,n = 140,nz = 553
iterations = 0
objective  = nan
golden     = -2.3313893e+06
seconds    = 277.674
error 
