m = 206,n = 203,nz = 552
iterations = 17
objective  = -5.2202061e+01
golden     = -5.2202061e+01
seconds    = 3.927
optimal solution 
