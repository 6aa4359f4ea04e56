m = 498,n = 614,nz = 2714
iterations = 556
objective  = 1.7279107e+05
golden     = 1.7279097e+05
seconds    = 99.088
optimal solution 
