m = 688,n = 1620,nz = 4158
iterations = 54
objective  = 3.2039791e+02
golden     = 3.2061973e+02
seconds    = 155.212
suboptimal solution 
