m = 97,n = 79,nz = 730
iterations = 0
objective  = nan
golden     = -4.1573224e+02
seconds    = 277.679
error 
