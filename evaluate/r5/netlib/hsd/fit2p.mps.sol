m = 3001,n = 13525,nz = 60784
iterations = 26
objective  = 6.8463073e+04
golden     = 6.8464293e+04
seconds    = 227.38
suboptimal solution 
