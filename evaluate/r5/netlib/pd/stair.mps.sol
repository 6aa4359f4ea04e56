m = 357,n = 467,nz = 3857
iterations = 1064
objective  = -2.5126695e+02
golden     = -2.5126695e+02
seconds    = 22.291
optimal solution 
