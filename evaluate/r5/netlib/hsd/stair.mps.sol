m = 357,n = 467,nz = 3857
iterations = 21
objective  = -2.5126695e+02
golden     = -2.5126695e+02
seconds    = 6.712
optimal solution 
