m = 118,n = 225,nz = 1182
iterations = 70
objective  = -7.6589318e+04
golden     = -7.6589319e+04
seconds    = 6.835
optimal solution 
