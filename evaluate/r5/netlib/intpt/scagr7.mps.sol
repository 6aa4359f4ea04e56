m = 130,n = 140,nz = 553
iterations = 50
objective  = -2.3313898e+06
golden     = -2.3313893e+06
seconds    = 6.835
optimal solution 
