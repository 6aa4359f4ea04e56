m = 224,n = 282,nz = 2767
iterations = 61
objective  = -1.8751929e+01
golden     = -1.8751929e+01
seconds    = 6.835
optimal solution 
