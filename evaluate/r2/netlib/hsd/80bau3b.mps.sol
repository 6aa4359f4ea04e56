m = 2263,n = 9799,nz = 29063
iterations = 138
objective  = 9.8722419e+05
golden     = 9.8723216e+05
seconds    = 781.137
optimal solution 
