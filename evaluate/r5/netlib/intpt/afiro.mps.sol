m = 28,n = 32,nz = 88
iterations = 30
objective  = -4.6475314e+02
golden     = -4.6475314e+02
seconds    = 6.835
optimal solution 
