m = 441,n = 946,nz = 8318
iterations = 43
objective  = -1.6083434e+08
golden     = -1.6083434e+08
seconds    = 6.019
optimal solution 
