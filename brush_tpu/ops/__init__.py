"""Device math: projection, spherical harmonics, compositing, binning, kernels."""
