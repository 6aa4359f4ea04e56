m = 234,n = 315,nz = 1525
iterations = 0
objective  = nan
golden     = 1.3730804e+03
seconds    = 277.718
error 
