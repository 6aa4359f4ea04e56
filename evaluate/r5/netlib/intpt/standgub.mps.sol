m = 362,n = 1184,nz = 3147
iterations = 80
objective  = 1.2576996e+03
golden     = 1.2576995e+03
seconds    = 19.002
optimal solution 
