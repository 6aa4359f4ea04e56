m = 416,n = 6184,nz = 43888
iterations = 0
objective  = nan
golden     = 3.1549167e+02
seconds    = 0.566
error 
