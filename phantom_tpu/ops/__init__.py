"""Device compute ops: modular arithmetic, NTT, RNS polynomial kernels."""
