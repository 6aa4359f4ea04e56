m = 44,n = 41,nz = 291
iterations = 41
objective  = -1.7499001e+03
golden     = -1.7499001e+03
seconds    = 6.835
optimal solution 
