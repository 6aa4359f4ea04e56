m = 441,n = 946,nz = 8318
iterations = 56
objective  = -1.6083433e+08
golden     = -1.6083434e+08
seconds    = 8.813
optimal solution 
