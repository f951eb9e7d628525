"""TPU-native compute kernels: matmul FFTs, scatter ops, pallas kernels."""
