m = 224,n = 282,nz = 2767
iterations = 504
objective  = -1.8751929e+01
golden     = -1.8751929e+01
seconds    = 6.57
optimal solution 
