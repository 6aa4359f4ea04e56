m = 28,n = 32,nz = 88
iterations = 17
objective  = -4.6475314e+02
golden     = -4.6475314e+02
seconds    = 111.165
optimal solution 
