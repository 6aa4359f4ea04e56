m = 14694,n = 21349,nz = 49058
iterations = 0
objective  = nan
golden     = -6.9723823e+09
seconds    = 4222.503
error 
