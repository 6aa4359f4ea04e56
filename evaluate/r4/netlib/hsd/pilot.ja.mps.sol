m = 941,n = 1988,nz = 14706
iterations = 49
objective  = -6.1131365e+03
golden     = -6.1131344e+03
seconds    = 26.074
optimal solution 
