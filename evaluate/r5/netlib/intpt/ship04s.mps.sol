m = 403,n = 1458,nz = 5810
iterations = 77
objective  = 1.7987148e+06
golden     = 1.7987147e+06
seconds    = 19.002
optimal solution 
