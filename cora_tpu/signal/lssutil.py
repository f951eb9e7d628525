"""Mathematical utilities for the LSS pipeline.

Re-design of the reference ``cora/signal/lssutil.py``: interpolation and
finite-difference helpers, spherical differential operators, power-spectrum
and correlation-function estimators from map shells, the
Fingers-of-God smoothing kernel, and the lognormal transform.

Differential operators on the sphere are built on the native SHT: the
angular gradient is a spin-1 synthesis (∂θ + i ∂φ/sinθ acting on a scalar
is a spin-1 field), replacing healpy.alm2map_der1 (reference
lssutil.py:225-261).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import numpy as np
import jax.numpy as jnp

from ..util import interpolation as cs
from ..util import xfer
from ..healpix import pixel as hpx
from ..healpix import sht as _sht
from ..healpix import transforms as hputil


def invert_no_zero(x):
    """Reciprocal that maps zeros to zero (caput.algorithms equivalent)."""
    x = np.asarray(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(x == 0, 0.0, 1.0 / x)
    return inv


def linspace(x) -> np.ndarray:
    """Config parser producing a linearly spaced array.

    Accepts a dict {start, stop, num[, endpoint]}, a list [start, stop,
    num[, endpoint]] or a ready-made array.
    """
    if not isinstance(x, (dict, list, np.ndarray)):
        raise ValueError(f"Require a dict, list or array type. Got a {type(x)}.")

    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, dict):
        start, stop, num = x["start"], x["stop"], x["num"]
        endpoint = x.get("endpoint", True)
    else:
        start, stop, num = x[0], x[1], x[2]
        endpoint = x[3] if len(x) == 4 else True
    return np.linspace(start, stop, num, endpoint=endpoint)


def sinh_interpolate(x, f, x_t: float = 1, f_t: float = 1) -> Callable:
    """1-D interpolation in arcsinh-scaled space (log-like, zero-safe)."""
    asf = np.arcsinh(np.asarray(f) / f_t)
    asx = np.arcsinh(np.asarray(x) / x_t)
    fs = cs.CubicSpline(asx, asf)

    def _f_asinh(x_):
        sx = np.arcsinh(np.asarray(x_) / x_t)
        return f_t * np.sinh(np.asarray(fs(sx)))

    return _f_asinh


def diff2(f: np.ndarray, x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Second derivative on a non-uniform grid (4-point interior scheme,
    one-sided 4-point stencils at the boundaries)."""
    f = np.asarray(f)
    x = np.asarray(x, dtype=np.float64)
    d2 = np.zeros_like(f)
    axis = axis % f.ndim

    def sl(v):
        return (slice(None),) * axis + (v,)

    n = f.shape[axis]

    # interior points (vectorised over i = 2 .. n-2)
    i = np.arange(2, n - 1)
    dm2 = x[i] - x[i - 2]
    dm1 = x[i] - x[i - 1]
    dp1 = x[i + 1] - x[i]

    alpha = 2 * (dp1 - dm1) / (dm2 * (dm2 + dp1) * (dm2 - dm1))
    beta = 2 * (dm2 - dp1) / (dm1 * (dm2 - dm1) * (dm1 + dp1))
    gamma = 2 * (dm2 + dm1) / (dp1 * (dm1 + dp1) * (dm2 + dp1))

    shape = [1] * f.ndim
    shape[axis] = len(i)

    def rs(c):
        return c.reshape(shape)

    d2[sl(i)] = (
        rs(alpha) * f[sl(i - 2)]
        + rs(beta) * f[sl(i - 1)]
        - rs(alpha + beta + gamma) * f[sl(i)]
        + rs(gamma) * f[sl(i + 1)]
    )

    # i = 0 one-sided
    dp1, dp2, dp3 = x[1] - x[0], x[2] - x[0], x[3] - x[0]
    alpha = 2 * (dp1 + dp2 + dp3) / (dp1 * dp2 * dp3)
    beta = -2 * (dp2 + dp3) / (dp1 * (dp1 - dp2) * (dp1 - dp3))
    gamma = 2 * (dp1 + dp3) / ((dp1 - dp2) * dp2 * (dp2 - dp3))
    delta = 2 * (dp1 + dp2) / ((dp1 - dp3) * dp3 * (-dp2 + dp3))
    d2[sl(0)] = (
        alpha * f[sl(0)] + beta * f[sl(1)] + gamma * f[sl(2)] + delta * f[sl(3)]
    )

    # i = 1
    dm1, dp1, dp2 = x[1] - x[0], x[2] - x[1], x[3] - x[1]
    alpha = 2 * (dp1 + dp2) / (dm1 * (dm1 + dp1) * (dm1 + dp2))
    beta = 2 * (dm1 - dp1 - dp2) / (dm1 * dp1 * dp2)
    gamma = 2 * (dm1 - dp2) / (dp1 * (dm1 + dp1) * (dp1 - dp2))
    delta = -2 * (dm1 - dp1) / ((dp1 - dp2) * dp2 * (dm1 + dp2))
    d2[sl(1)] = (
        alpha * f[sl(0)] + beta * f[sl(1)] + gamma * f[sl(2)] + delta * f[sl(3)]
    )

    # i = n-1 one-sided
    dm1, dm2, dm3 = x[-1] - x[-2], x[-1] - x[-3], x[-1] - x[-4]
    alpha = 2 * (dm1 + dm2) / ((dm1 - dm3) * dm3 * (-dm2 + dm3))
    beta = 2 * (dm1 + dm3) / ((dm1 - dm2) * dm2 * (dm2 - dm3))
    gamma = -2 * (dm2 + dm3) / (dm1 * (dm1 - dm2) * (dm1 - dm3))
    delta = 2 * (dm1 + dm2 + dm3) / (dm1 * dm2 * dm3)
    d2[sl(-1)] = (
        alpha * f[sl(-4)] + beta * f[sl(-3)] + gamma * f[sl(-2)] + delta * f[sl(-1)]
    )

    return d2


def diff2_matrix(x: np.ndarray) -> np.ndarray:
    """The :func:`diff2` stencil as a dense [n, n] matrix.

    ``diff2_matrix(x) @ f == diff2(f, x, axis=0)`` (same coefficients;
    only the summation order differs).  Radial operators expressed as
    matrices apply as one pixel-sharded MXU matmul on a device mesh —
    the TPU-native form of the reference's pixel-redistributed radial
    derivative loops (cora/signal/lss.py:886).
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    D = np.zeros((n, n))

    i = np.arange(2, n - 1)
    dm2 = x[i] - x[i - 2]
    dm1 = x[i] - x[i - 1]
    dp1 = x[i + 1] - x[i]
    alpha = 2 * (dp1 - dm1) / (dm2 * (dm2 + dp1) * (dm2 - dm1))
    beta = 2 * (dm2 - dp1) / (dm1 * (dm2 - dm1) * (dm1 + dp1))
    gamma = 2 * (dm2 + dm1) / (dp1 * (dm1 + dp1) * (dm2 + dp1))
    D[i, i - 2] = alpha
    D[i, i - 1] = beta
    D[i, i] = -(alpha + beta + gamma)
    D[i, i + 1] = gamma

    dp1, dp2, dp3 = x[1] - x[0], x[2] - x[0], x[3] - x[0]
    D[0, 0] = 2 * (dp1 + dp2 + dp3) / (dp1 * dp2 * dp3)
    D[0, 1] = -2 * (dp2 + dp3) / (dp1 * (dp1 - dp2) * (dp1 - dp3))
    D[0, 2] = 2 * (dp1 + dp3) / ((dp1 - dp2) * dp2 * (dp2 - dp3))
    D[0, 3] = 2 * (dp1 + dp2) / ((dp1 - dp3) * dp3 * (-dp2 + dp3))

    dm1, dp1, dp2 = x[1] - x[0], x[2] - x[1], x[3] - x[1]
    D[1, 0] = 2 * (dp1 + dp2) / (dm1 * (dm1 + dp1) * (dm1 + dp2))
    D[1, 1] = 2 * (dm1 - dp1 - dp2) / (dm1 * dp1 * dp2)
    D[1, 2] = 2 * (dm1 - dp2) / (dp1 * (dm1 + dp1) * (dp1 - dp2))
    D[1, 3] = -2 * (dm1 - dp1) / ((dp1 - dp2) * dp2 * (dm1 + dp2))

    dm1, dm2, dm3 = x[-1] - x[-2], x[-1] - x[-3], x[-1] - x[-4]
    D[-1, -4] = 2 * (dm1 + dm2) / ((dm1 - dm3) * dm3 * (-dm2 + dm3))
    D[-1, -3] = 2 * (dm1 + dm3) / ((dm1 - dm2) * dm2 * (dm2 - dm3))
    D[-1, -2] = -2 * (dm2 + dm3) / (dm1 * (dm1 - dm2) * (dm1 - dm3))
    D[-1, -1] = 2 * (dm1 + dm2 + dm3) / (dm1 * dm2 * dm3)
    return D


def gradient_matrix(x: np.ndarray) -> np.ndarray:
    """``np.gradient(f, x, axis=0)`` as a dense [n, n] matrix.

    Second-order interior stencil on the non-uniform grid, first-order
    one-sided edges (numpy's edge_order=1 default) — the radial part of
    :func:`gradient` as one pixel-sharded matmul.
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    G = np.zeros((n, n))

    i = np.arange(1, n - 1)
    hd = x[i] - x[i - 1]
    hs = x[i + 1] - x[i]
    G[i, i - 1] = -hs / (hd * (hd + hs))
    G[i, i] = (hs - hd) / (hs * hd)
    G[i, i + 1] = hd / (hs * (hd + hs))

    G[0, 0] = -1.0 / (x[1] - x[0])
    G[0, 1] = 1.0 / (x[1] - x[0])
    G[-1, -2] = -1.0 / (x[-1] - x[-2])
    G[-1, -1] = 1.0 / (x[-1] - x[-2])
    return G


def laplacian(maps: np.ndarray, x: np.ndarray,
              lmax: Optional[int] = None) -> np.ndarray:
    """Laplacian of a stack of HEALPix shells at radii x.

    Angular part via −l(l+1) in harmonic space, radial part by finite
    differences (reference lssutil.py:188-224).

    The analysis band defaults to ℓ ≤ 2·nside, NOT healpy's 3·nside−1:
    HEALPix pixel quadrature is exact-class only to ~2·nside, and the
    −l(l+1) weighting amplifies the corner-band residual into
    order-unity polar-cap artefacts (measured in tests/test_lssutil.py).
    The LSS fields this operates on are steeply red, so the truncation
    itself is negligible; pass lmax=3*nside-1 for reference-shaped
    behaviour on arbitrary inputs.
    """
    maps = np.asarray(maps)
    nside = hpx.npix2nside(maps.shape[1])
    if lmax is None:
        lmax = 2 * nside

    alms = xfer.get(_sht.map2alm(maps, lmax, 3))
    ell = np.arange(lmax + 1)[:, None]
    alms *= -ell * (ell + 1)

    # np.array (copy): jax device buffers view as read-only ndarrays
    d2 = np.array(_sht.alm2map(jnp.asarray(alms), nside))
    d2 /= x[:, np.newaxis] ** 2

    d2 += diff2(maps, x, axis=0) + 2 * np.gradient(maps, x, axis=0) / x[:, np.newaxis]
    return d2


def gradient(maps: np.ndarray, x: np.ndarray, grad0: bool = True,
             lmax: Optional[int] = None) -> np.ndarray:
    """Gradient of a stack of HEALPix shells: [d/dr, dθ/r, dφ/(r sinθ)].

    The angular derivatives are one batched spin-1 synthesis: for a scalar
    field f, (∂θ f) + i (∂φ f / sinθ) = −Σ sqrt(l(l+1)) a_lm ₁Y_lm.

    Analysis band defaults to ℓ ≤ 2·nside (see :func:`laplacian` — the
    √(l(l+1)) weighting amplifies the above-2·nside quadrature residual
    ~100× at the poles); pass lmax explicitly to override.
    """
    from ..healpix import spin as _spin

    maps = np.asarray(maps)
    nside = hpx.npix2nside(maps.shape[1])
    if lmax is None:
        lmax = 2 * nside
    nmaps = maps.shape[0]

    grad = np.zeros((3,) + maps.shape, dtype=maps.dtype)

    alm = xfer.get(_sht.map2alm(maps, lmax, 3))
    ell = np.arange(lmax + 1)[:, None]
    almE = alm * np.sqrt(ell * (ell + 1.0))

    op = _spin.get_spin_sht(nside, lmax, 1)
    aE = xfer.put(-almE)  # complex H2D through the transfer shim
    dth, dph = op.synthesis(aE, xfer.zeros_like(aE))
    grad[1] = np.asarray(dth) / x[:, np.newaxis]
    grad[2] = np.asarray(dph) / x[:, np.newaxis]

    if grad0:
        grad[0] = np.gradient(maps, x, axis=0)

    return grad


def cutoff(x, cut: float, sign: int, width: float, index: float):
    """Smooth tanh cutoff: ~1 on one side, power-law dropoff on the other."""
    sign = np.sign(sign)
    return (0.5 * (1 + np.tanh(sign * (np.log10(x) - cut) / width))) ** index


def pk_flat(
    maps: np.ndarray,
    chi: np.ndarray,
    maps2: Optional[np.ndarray] = None,
    lmax: Optional[int] = None,
    window: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Estimate a 2D (k_par, k_perp) power spectrum from spherical shells.

    Flat-sky thin-shell estimator (reference lssutil.py:293-376): radial
    rfft, complex SHT of each radial mode, m-average per l.
    """
    if maps2 is not None and maps.shape != maps2.shape:
        raise ValueError("Shape of maps2 is not compatible with maps")

    chi = np.asarray(chi, dtype=np.float64)
    chi_mean = chi.mean()
    nside = hpx.npix2nside(maps.shape[1])
    if lmax is None:
        lmax = 3 * nside

    N = len(chi)
    dx = np.ptp(chi) / (N - 1)
    L = N * dx

    cn = np.fft.rfft(maps, axis=0) / N
    almn = np.array([xfer.get(hputil.sphtrans_complex(m, lmax)) for m in cn])

    ell = np.arange(lmax + 1)
    if maps2 is None:
        cln = (np.abs(almn) ** 2).sum(axis=-1)
    else:
        cn2 = np.fft.rfft(maps2, axis=0) / N
        almn2 = np.array([xfer.get(hputil.sphtrans_complex(m, lmax)) for m in cn2])
        cln = (almn * almn2.conj()).sum(axis=-1).real

    cln /= (2 * ell + 1)[np.newaxis, :]

    kperp = ell / chi_mean
    kpar = 2 * np.pi * np.arange(cn.shape[0]) / L
    cln *= L * chi_mean**2

    if window:
        Wk = np.sinc(kpar * dx / (2 * np.pi))
        cln /= Wk[:, np.newaxis] ** 2

    return cln, kpar, kperp


def corrfunc(
    maps: np.ndarray,
    chi: np.ndarray,
    lmax: Optional[int] = None,
    rmax: float = 1e3,
    numr: int = 1024,
) -> Tuple[np.ndarray, np.ndarray]:
    """Estimate a 1D correlation function ξ(r) from spherical shells.

    anafast C_l per shell pair → Legendre resum → binned in separation
    (reference lssutil.py:379-443).
    """
    from .corrfunc import legendre_array

    maps = np.asarray(maps)
    if lmax is None:
        lmax = 3 * hpx.npix2nside(maps.shape[1]) - 1

    # cross-spectra between shells separated by a fixed number of slices
    nx = len(chi)
    alm = xfer.get(_sht.map2alm(maps, lmax, 3))

    xxp = []
    cl_list = []
    for i in range(nx):
        for j in range(i, nx):
            prod = alm[j - i] * np.conj(alm[j])
            s = prod[..., 0] + 2 * prod[..., 1:].sum(axis=-1).real
            cl_list.append((s / (2 * np.arange(lmax + 1) + 1)).real)
            xxp.append((chi[j - i], chi[j]))

    clxx = np.array(cl_list)
    r1, r2 = np.array(xxp).T

    t = np.linspace(0, np.pi, 2048)
    mu = np.cos(t)

    Pl_arr = legendre_array(lmax, mu)
    Pl_arr *= (2 * np.arange(lmax + 1)[:, np.newaxis] + 1) / (4 * np.pi)

    cthetaxx = np.dot(clxx, Pl_arr)

    r1 = r1[:, np.newaxis]
    r2 = r2[:, np.newaxis]
    mu = mu[np.newaxis, :]
    rc = ((r1 - r2) ** 2 + 2 * r1 * r2 * (1 - mu)) ** 0.5

    rbins = np.linspace(0, rmax, numr + 1)
    rcentre = 0.5 * (rbins[1:] + rbins[:-1])

    r_ind = np.digitize(rc.ravel(), rbins)
    norm = np.bincount(r_ind, minlength=numr + 2)
    csum = np.bincount(r_ind, weights=cthetaxx.ravel(), minlength=numr + 2)

    cf = (csum * invert_no_zero(norm))[1:-1].copy()
    return cf, rcentre


def ang_correlation(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Angular correlation coefficient r_l between two maps."""
    cl_xx = np.asarray(_sht.anafast(x))
    cl_yy = np.asarray(_sht.anafast(y))
    cl_xy = np.asarray(_sht.anafast(x, y))
    return cl_xy / (cl_xx * cl_yy) ** 0.5


def transfer(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Angular transfer function T_l = C_l^{xy} / C_l^{yy}."""
    cl_yy = np.asarray(_sht.anafast(y))
    cl_xy = np.asarray(_sht.anafast(x, y))
    return cl_xy / cl_yy


def calculate_width(centres: np.ndarray) -> np.ndarray:
    """Estimate contiguous bin widths from bin centres."""
    centres = np.asarray(centres, dtype=np.float64)
    widths = np.zeros(len(centres))
    widths[1:-1] = (centres[2:] - centres[:-2]) / 2.0
    widths[0] = 2 * (centres[1] - (widths[1] / 2.0) - centres[0])
    widths[-1] = 2 * (centres[-1] - (widths[-2] / 2.0) - centres[-2])
    return np.abs(widths)


def exponential_FoG_kernel(chi: np.ndarray, sigmaP, D) -> np.ndarray:
    r"""Exponential radial smoothing kernel approximating Fingers of God.

    Fourier conjugate of a squared-Lorentzian damping
    :math:`(1 + k_\parallel^2\sigma_P^2/2)^{-1}`; rows are mass-conserving,
    bin widths are integrated with sinhc factors, and any growth factor
    already applied per bin is divided out / re-applied
    (reference lssutil.py:518-589).
    """
    chi = np.asarray(chi, dtype=np.float64)
    if not isinstance(sigmaP, np.ndarray):
        sigmaP = np.ones_like(chi) * sigmaP
    if not isinstance(D, np.ndarray):
        D = np.ones_like(chi) * D

    a = 2**0.5 / sigmaP
    ar = a[:, np.newaxis]

    dchi = calculate_width(chi)[np.newaxis, :]
    chi_sep = np.abs(chi[:, np.newaxis] - chi[np.newaxis, :])

    def sinhc(x):
        return np.sinh(x) / x

    K = np.exp(-ar * chi_sep) * sinhc(ar * dchi / 2.0)
    np.fill_diagonal(K, np.diagonal(np.exp(-ar * dchi / 4) * sinhc(ar * dchi / 4)))

    K /= np.sum(K, axis=1)[:, np.newaxis]
    K /= D[np.newaxis, :]
    K *= D[:, np.newaxis]
    return K


def lognormal_transform(
    field: np.ndarray, out: Optional[np.ndarray] = None, axis: int = None
) -> np.ndarray:
    """Transform to a lognormal field with matched two-point statistics."""
    if out is None:
        out = np.zeros_like(field)
    elif field.shape != out.shape or field.dtype != out.dtype:
        raise ValueError("Given output array is incompatible.")

    if field is not out:
        out[:] = field

    var = field.var(axis=axis, keepdims=True)
    out -= var / 2.0
    np.exp(out, out=out)
    out -= 1
    return out


def assert_shape(arr, shape, name):
    if arr.ndim != len(shape):
        raise ValueError(
            f"Array {name} has wrong number of dimensions (got {arr.ndim}, "
            f"expected {len(shape)}"
        )
    if arr.shape != shape:
        raise ValueError(
            f"Array {name} has the wrong shape (got {arr.shape}, expected {shape}"
        )
