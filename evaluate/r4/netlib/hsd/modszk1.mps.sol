m = 688,n = 1620,nz = 4158
iterations = 36
objective  = 3.2048812e+02
golden     = 3.2061973e+02
seconds    = 84.708
suboptimal solution 
