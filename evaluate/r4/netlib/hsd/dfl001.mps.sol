m = 6072,n = 12230,nz = 41873
iterations = 0
objective  = nan
golden     = 1.1266400e+07
seconds    = 391.614
error 
