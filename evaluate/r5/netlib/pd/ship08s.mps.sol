m = 779,n = 2387,nz = 9501
iterations = 896
objective  = 1.9200982e+06
golden     = 1.9200982e+06
seconds    = 158.927
optimal solution 
