m = 1152,n = 5427,nz = 21597
iterations = 0
objective  = nan
golden     = 1.4701879e+06
seconds    = 3.061
error 
