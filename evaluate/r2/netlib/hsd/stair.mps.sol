m = 357,n = 467,nz = 3857
iterations = 54
objective  = -2.5126695e+02
golden     = -2.5126695e+02
seconds    = 3.245
optimal solution 
