"""TPU compute ops: spectral convolution and (future) Pallas kernels."""
