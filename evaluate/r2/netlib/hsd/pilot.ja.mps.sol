m = 941,n = 1988,nz = 14706
iterations = 184
objective  = -6.1131361e+03
golden     = -6.1131344e+03
seconds    = 143.792
optimal solution 
