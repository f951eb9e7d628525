"""Utility layer: interpolation, bilinear lookup, linear algebra, FFT helpers."""
