m = 1152,n = 5427,nz = 21597
iterations = 29
objective  = 1.4701879e+06
golden     = 1.4701879e+06
seconds    = 28.358
optimal solution 
