"""Core synthesis engine: sky simulation, Gaussian fields, map geometry."""
