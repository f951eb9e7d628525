"""LOFAR-style galactic synchrotron foreground (Jelic et al. 2008).

Re-design of the reference ``cora/foreground/lofar.py``: a 3-D power-law
emission volume with independent per-cell amplitude and spectral index,
integrated along the line of sight to a T_b(nu, x, y) cube.
"""

from __future__ import annotations

import numpy as np

from ..core import maps, gaussianfield


class _LofarGDSE_3D(gaussianfield.RandomField):
    delta = -4.0

    def powerspectrum(self, karray):
        """Power-law P(k) with the zero mode removed."""
        ps = (karray**2).sum(axis=3) ** (self.delta / 2.0)
        ps[0, 0, 0] = 0.0
        return ps


class LofarGDSE(maps.Map3d):
    """LOFAR synchrotron model: integrate a 3-D emission volume.

    Each cell has an independent amplitude and power-law spectral index;
    the cube is summed along the third axis per frequency.
    """

    nu_0 = 325.0

    correlated = False

    A_amp = 20
    A_std = A_amp * 0.02

    beta_mean = -2.55
    beta_std = 0.1

    alpha = -2.7

    def getfield(self, key=None):
        """T_b cube [freq, x, y]."""
        import jax

        numz = int((self.x_num + self.y_num) // 2)

        npix = [self.x_num, self.y_num, numz]
        wsize = [5.0 / self.x_width, 5.0 / self.y_width, 1.0]
        lf = _LofarGDSE_3D(npix=npix, wsize=wsize)
        lf.delta = self.alpha

        if key is not None:
            k1, k2 = jax.random.split(key)
        else:
            k1 = k2 = None

        A = lf.getfield(key=k1)
        beta = A if self.correlated else lf.getfield(key=k2)

        A = ((1.0 * self.A_amp) / numz) + A * (self.A_std / A.sum(axis=2).std())
        beta = self.beta_mean + beta * (self.beta_std / beta.std())

        freq = self.nu_pixels / self.nu_0

        # vectorised over frequency (the reference loops per channel)
        Tb = (A[np.newaxis] * freq[:, np.newaxis, np.newaxis, np.newaxis] ** beta).sum(
            axis=3
        )
        return Tb
