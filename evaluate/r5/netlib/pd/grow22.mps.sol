m = 441,n = 946,nz = 8318
iterations = 1410
objective  = -1.6083434e+08
golden     = -1.6083434e+08
seconds    = 163.88
optimal solution 
