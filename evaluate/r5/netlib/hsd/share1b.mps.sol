m = 118,n = 225,nz = 1182
iterations = 25
objective  = -7.6589319e+04
golden     = -7.6589319e+04
seconds    = 3.927
optimal solution 
