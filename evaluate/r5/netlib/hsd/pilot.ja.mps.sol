m = 941,n = 1988,nz = 14706
iterations = 51
objective  = -6.1131365e+03
golden     = -6.1131344e+03
seconds    = 10.683
optimal solution 
