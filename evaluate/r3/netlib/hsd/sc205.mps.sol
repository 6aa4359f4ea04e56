m = 206,n = 203,nz = 552
iterations = 19
objective  = -5.2202060e+01
golden     = -5.2202061e+01
seconds    = 38.99
optimal solution 
