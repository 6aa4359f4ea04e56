m = 362,n = 1184,nz = 3147
iterations = 73
objective  = 1.2576995e+03
golden     = 1.2576995e+03
seconds    = 32.777
optimal solution 
