m = 2393,n = 5405,nz = 31499
iterations = 0
objective  = nan
golden     = -4.3021476e+06
seconds    = 37.663
error 
