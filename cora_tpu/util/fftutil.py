"""FFT helpers for n-dimensional real transforms.

Equivalent of the reference ``cora/util/fftutil.py`` (minus the long-dead
``anfft`` path, fftutil.py:4-11): frequency-vector grids for real FFTs and
thin rfftn/irfftn wrappers.  Host paths use numpy; the device variants are
plain jnp.fft calls at the call sites that need them.
"""

from __future__ import annotations

import numpy as np


def rfftfreqn(n, d=None):
    """Frequency vectors for an n-dimensional *real* FFT.

    Parameters
    ----------
    n : sequence of int
        Grid dimensions.
    d : sequence of float, optional
        Sample spacing along each dimension (default 1/n per axis,
        i.e. frequencies in cycles per grid length).

    Returns
    -------
    freqs : np.ndarray[n[0], ..., n[-1]//2 + 1, len(n)]
        The frequency vector at each rfft sample.
    """
    n = np.asarray(n, dtype=int)
    ndim = len(n)

    if d is None:
        scale = n.astype(np.float64)
    else:
        d = np.asarray(d, dtype=np.float64)
        if len(d) != ndim:
            raise ValueError("Sample spacing array is the wrong length.")
        scale = d * n

    axes = []
    for i in range(ndim - 1):
        axes.append(np.fft.fftfreq(n[i], d=1.0) * n[i])
    axes.append(np.arange(n[-1] // 2 + 1, dtype=np.float64))

    grids = np.meshgrid(*axes, indexing="ij")
    out = np.stack(grids, axis=-1)
    return out / scale


def rfftn(arr):
    """Real n-D FFT (numpy)."""
    import warnings

    if arr.shape[-1] % 2 != 0:
        warnings.warn(
            "Last axis length not a multiple of 2; irfftn will not invert exactly."
        )
    return np.fft.rfftn(arr)


def irfftn(arr, s=None):
    """Inverse real n-D FFT (numpy)."""
    return np.fft.irfftn(arr, s=s)
