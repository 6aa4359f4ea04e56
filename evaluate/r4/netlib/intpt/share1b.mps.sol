m = 118,n = 225,nz = 1182
iterations = 0
objective  = nan
golden     = -7.6589319e+04
seconds    = 277.703
error 
