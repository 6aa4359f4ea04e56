m = 141,n = 301,nz = 2633
iterations = 0
objective  = nan
golden     = -4.7787812e+07
seconds    = 217.065
error 
