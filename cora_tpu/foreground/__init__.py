"""Foreground models: Gaussian SCK foregrounds, galactic synchrotron,
point sources, Poisson processes, LOFAR-style cubes."""
