m = 617,n = 1092,nz = 3467
iterations = 24
objective  = 6.9022360e+06
golden     = 6.9022360e+06
seconds    = 5.265
optimal solution 
