m = 2953,n = 7535,nz = 16390
iterations = 36
objective  = 2.8857862e+10
golden     = 2.8857862e+10
seconds    = 111.634
optimal solution 
