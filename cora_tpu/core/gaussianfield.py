"""Gaussian random field realisations in k-space.

Re-design of the reference ``cora/core/gaussianfield.py``: realise an n-D
Gaussian field from a power spectrum by weighting white noise in rfft space
and inverse transforming.  Keyed jax.random replaces the global numpy RNG;
the weight construction matches gaussianfield.py:70-100 (including the
sqrt(P)·N/sqrt(2V) normalisation and zeroing of a non-finite zero mode).
"""

from __future__ import annotations

import numpy as np
import jax

from ..util import fftutil
from . import maps


class RandomField:
    """Realise an n-dimensional Gaussian field from a power spectrum.

    Parameters
    ----------
    npix : list of int
        Pixels along each axis.
    wsize : list of float, optional
        Physical width along each axis (defaults to npix — unit pixels).
    """

    _kweightgen = False
    _n = None
    _w = None

    def __init__(self, npix=None, wsize=None):
        self._n = np.array(npix) if npix is not None else None
        self._w = np.array(wsize) if wsize is not None else self._n

    def _check_input(self):
        if self._n is None or self._w is None:
            raise ValueError("Either self._n or self._w has not been set.")
        if len(self._n) != len(self._w):
            raise ValueError("Width array must be the same length as npix.")
        if not ((self._n > 0).all() and (self._w > 0).all()):
            raise ValueError("Array elements must be positive.")

    def powerspectrum(self, karray):
        """P(k) at each wavevector; karray[..., ndim] in angular frequency."""
        raise NotImplementedError("Abstract method: need to override.")

    def generate_kweight(self, regen=False):
        """Pregenerate the rfft-space weights sqrt(P)·N/sqrt(2V)."""
        self._check_input()
        if self._kweightgen and not regen:
            return

        spacing = self._w / self._n
        kvec = fftutil.rfftfreqn(self._n, spacing / (2 * np.pi))

        self._kweight = (
            self.powerspectrum(kvec) ** 0.5
            * self._n.prod()
            / (2.0 * self._w.prod()) ** 0.5
        )

        if not np.isfinite(self._kweight.flat[0]):
            self._kweight.flat[0] = 0.0

        self._kweightgen = True

    def getfield(self, key=None):
        """Generate a new realisation; shape == npix."""
        self.generate_kweight()
        s = self._kweight.shape

        if key is None:
            f = np.random.standard_normal(s) + 1.0j * np.random.standard_normal(s)
        else:
            k1, k2 = jax.random.split(key)
            f = np.asarray(jax.random.normal(k1, s)) + 1.0j * np.asarray(
                jax.random.normal(k2, s)
            )
        f *= self._kweight

        return fftutil.irfftn(f, s=tuple(self._n))


class RandomFieldA2F(RandomField, maps.Map3d):
    """3-D realisation bound to a Map3d geometry (two angles + frequency)."""

    def generate_kweight(self, *args):
        self._n = self._num_array()
        self._w = self._width_array()
        RandomField.generate_kweight(self, *args)


class RandomFieldA2(RandomField, maps.Map2d):
    """2-D realisation bound to a Map2d geometry."""

    def generate_kweight(self, *args):
        self._n = self._num_array()
        self._w = self._width_array()
        RandomField.generate_kweight(self, *args)


class Cmb(RandomFieldA2):
    """Simulate a patch of the CMB from a C_l table file.

    The reference shipped no default data file (gaussianfield.py:170 is a
    dead path); here `psfile` is required.
    """

    def __init__(self, psfile, cambnorm=True):
        from ..util.interpolation import LogSpline

        if cambnorm:
            a = np.loadtxt(psfile)
            l = a[:, 0]
            tt = (2 * np.pi) * a[:, 1] / (l * (l + 1.0))
            self._powerspectrum_int = LogSpline(np.vstack((l, tt)).T)
        else:
            self._powerspectrum_int = LogSpline.fromfile(psfile)

    def powerspectrum(self, karray):
        k = (karray**2).sum(axis=2) ** 0.5
        return np.asarray(self._powerspectrum_int(np.maximum(k, 1e-30)))


class TestF(RandomFieldA2F):
    """Demo anisotropic Gaussian power spectrum on a map volume
    (reference cora/core/gaussianfield.py:185): a 250-unit radial scale
    times a 1-degree angular scale."""

    def powerspectrum(self, karray):
        from .. import constants

        return np.exp(
            -0.5 * (karray[..., 0] / (2 * np.pi / 250.0)) ** 2
        ) * np.exp(
            -0.5
            * (karray[..., 1:3] ** 2).sum(axis=3)
            / (2 * np.pi / (1.0 * constants.degree)) ** 2
        )
