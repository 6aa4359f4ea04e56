m = 28,n = 32,nz = 88
iterations = 23
objective  = -4.6475314e+02
golden     = -4.6475314e+02
seconds    = 6.57
optimal solution 
