m = 6072,n = 12230,nz = 41873
iterations = 55
objective  = 1.1212277e+07
golden     = 1.1266400e+07
seconds    = 645.666
suboptimal solution 
