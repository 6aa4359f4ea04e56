m = 491,n = 1169,nz = 4029
iterations = 2601
objective  = 9.0429695e+02
golden     = 9.0429999e+02
seconds    = 112.492
optimal solution 
