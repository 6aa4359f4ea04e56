m = 28,n = 32,nz = 88
iterations = 0
objective  = nan
golden     = -4.6475314e+02
seconds    = 277.615
error 
