m = 441,n = 946,nz = 8318
iterations = 131
objective  = -1.6052920e+08
golden     = -1.6083434e+08
seconds    = 71.58
dual infeasible 
