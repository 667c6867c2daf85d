"""TPU-native numerics primitives: stencils, calibrated filters, resampling, warping."""
