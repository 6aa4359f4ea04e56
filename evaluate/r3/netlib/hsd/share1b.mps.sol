m = 118,n = 225,nz = 1182
iterations = 28
objective  = -7.6589318e+04
golden     = -7.6589319e+04
seconds    = 4.941
optimal solution 
