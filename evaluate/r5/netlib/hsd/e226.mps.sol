m = 224,n = 282,nz = 2767
iterations = 24
objective  = -1.8751929e+01
golden     = -1.8751929e+01
seconds    = 3.927
optimal solution 
