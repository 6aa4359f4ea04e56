m = 1442,n = 3652,nz = 43220
iterations = 0
objective  = nan
golden     = -5.5740430e+02
seconds    = 0.159
error 
