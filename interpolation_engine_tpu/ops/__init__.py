"""Device kernels: byte-scan interpolation, wildcard match, math eval."""
