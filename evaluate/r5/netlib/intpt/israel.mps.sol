m = 175,n = 142,nz = 2358
iterations = 81
objective  = -8.9664481e+05
golden     = -8.9664482e+05
seconds    = 6.835
optimal solution 
