m = 221,n = 249,nz = 2150
iterations = 0
objective  = nan
golden     = 1.5185099e+03
seconds    = 277.732
error 
