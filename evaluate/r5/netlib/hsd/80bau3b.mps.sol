m = 2263,n = 9799,nz = 29063
iterations = 53
objective  = 9.8722420e+05
golden     = 9.8723216e+05
seconds    = 45.386
optimal solution 
