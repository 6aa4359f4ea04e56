m = 617,n = 1092,nz = 3467
iterations = 1216
objective  = 6.9022360e+06
golden     = 6.9022360e+06
seconds    = 263.644
optimal solution 
