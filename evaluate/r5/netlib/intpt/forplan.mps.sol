m = 162,n = 421,nz = 4916
iterations = 81
objective  = -6.6437819e+02
golden     = -6.6421874e+02
seconds    = 6.835
optimal solution 
