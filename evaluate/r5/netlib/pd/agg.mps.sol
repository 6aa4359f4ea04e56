m = 489,n = 163,nz = 2541
iterations = 0
objective  = nan
golden     = -3.5991767e+07
seconds    = 217.047
error 
