m = 2953,n = 7535,nz = 16390
iterations = 0
objective  = nan
golden     = 2.8857862e+10
seconds    = 300.056
error 
