m = 3001,n = 13525,nz = 60784
iterations = 0
objective  = nan
golden     = 6.8464293e+04
seconds    = 301.919
error 
