m = 118,n = 225,nz = 1182
iterations = 82
objective  = -7.6589313e+04
golden     = -7.6589319e+04
seconds    = 3.978
optimal solution 
