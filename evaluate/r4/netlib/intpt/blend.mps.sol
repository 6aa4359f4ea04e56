m = 75,n = 83,nz = 521
iterations = 0
objective  = nan
golden     = -3.0812150e+01
seconds    = 277.662
error 
