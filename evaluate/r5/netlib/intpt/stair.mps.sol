m = 357,n = 467,nz = 3857
iterations = 65
objective  = -2.2339036e+02
golden     = -2.5126695e+02
seconds    = 13.038
primal infeasible 
