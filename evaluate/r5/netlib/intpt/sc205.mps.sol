m = 206,n = 203,nz = 552
iterations = 50
objective  = -5.2202061e+01
golden     = -5.2202061e+01
seconds    = 6.835
optimal solution 
