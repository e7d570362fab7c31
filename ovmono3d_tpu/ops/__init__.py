"""Detection kernel library: fixed-shape, jittable TPU-native ops."""
