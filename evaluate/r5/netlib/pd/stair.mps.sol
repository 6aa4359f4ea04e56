m = 357,n = 467,nz = 3857
iterations = 0
objective  = nan
golden     = -2.5126695e+02
seconds    = 217.08
error 
