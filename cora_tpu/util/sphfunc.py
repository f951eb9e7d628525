"""Spherical Bessel functions j_l(x) and derivatives, stable to high order.

Working replacement for the reference's *missing* ``cora.util.sphfunc``
module (imported by the dead exact-C_l path, reference
cora/signal/corr.py:793 — the module is absent upstream, so
``angular_powerspectrum_full`` raises ImportError there).  This native
implementation restores that capability.

Algorithms (standard, no external special-function dependency):

* ``x > l`` (oscillatory regime): upward recurrence
  ``j_{n+1} = (2n+1)/x · j_n − j_{n−1}`` from the closed forms of j_0, j_1.
  Upward is neutrally stable while ``n ≲ x``.
* ``x ≤ l`` (decay regime): Miller's downward recurrence from a start order
  ``M = lmax + max(40, √(40·lmax))`` with per-column overflow rescaling,
  normalised against the closed-form j_0 (or j_1 where sin x ≈ 0).

Derivatives come from exact identities, not finite differences:
``j_l' = j_{l−1} − (l+1)/x · j_l`` and the defining ODE
``j_l'' = −(2/x) j_l' + (l(l+1)/x² − 1) j_l``.

Everything is vectorised numpy float64 over x (host-side by design: the
recurrences need f64 and this feeds the *cold* exact-C_l quadrature; the
hot C_l path is the device DCT lookup in :mod:`cora_tpu.signal.clfast`).
"""

from __future__ import annotations

import numpy as np

__all__ = ["jl", "jl_d", "jl_d2", "jl_rows"]

_RESCALE = 1e250


def _j0(x):
    out = np.ones_like(x)
    nz = np.abs(x) > 1e-10
    out[nz] = np.sin(x[nz]) / x[nz]
    small = ~nz
    out[small] = 1.0 - x[small] ** 2 / 6.0
    return out


def _j1(x):
    out = np.zeros_like(x)
    nz = np.abs(x) > 1e-6
    xn = x[nz]
    out[nz] = np.sin(xn) / xn**2 - np.cos(xn) / xn
    small = ~nz
    out[small] = x[small] / 3.0
    return out


def _rows_upward(rows, lmax, x):
    """Upward recurrence; valid where x ≳ lmax. Returns {l: j_l(x)}."""
    jm, jc = _j0(x), _j1(x)
    out = {}
    if 0 in rows:
        out[0] = jm.copy()
    if 1 in rows:
        out[1] = jc.copy()
    for n in range(1, lmax):
        jm, jc = jc, (2 * n + 1) / x * jc - jm
        if n + 1 in rows:
            out[n + 1] = jc.copy()
    return out


def _rows_downward(rows, lmax, x):
    """Miller downward recurrence; stable for all x, required for x < lmax."""
    m = lmax + max(40, int(np.sqrt(40.0 * max(lmax, 1))) + 10)
    jp = np.zeros_like(x)  # j_{n+1} (scaled)
    jc = np.full_like(x, 1e-300)  # j_n (scaled, arbitrary start)
    stored = {}
    for n in range(m, 0, -1):
        jp, jc = jc, (2 * n + 1) / x * jc - jp
        big = np.abs(jc) > _RESCALE
        if np.any(big):
            jc[big] *= 1.0 / _RESCALE
            jp[big] *= 1.0 / _RESCALE
            for arr in stored.values():
                arr[big] *= 1.0 / _RESCALE
        if n - 1 in rows:
            stored[n - 1] = jc.copy()
    # After the final (n=1) iteration jc holds scaled j_0, jp scaled j_1;
    # both carry every rescale, unlike a mid-loop snapshot would.
    j0s, j1s = jc, jp
    # Normalise against whichever closed form is better conditioned.
    j0t, j1t = _j0(x), _j1(x)
    use0 = np.abs(j0s) >= np.abs(j1s)
    denom = np.where(use0, j0s, j1s)
    numer = np.where(use0, j0t, j1t)
    norm = np.where(denom != 0.0, numer / np.where(denom == 0.0, 1.0, denom), 0.0)
    return {l: arr * norm for l, arr in stored.items()}


def jl_rows(rows, x):
    """j_l(x) for each l in ``rows`` (iterable of ints), x array-like.

    Returns a dict {l: ndarray like x}.  Splits elements between the upward
    (x > lmax+2) and downward (Miller) recurrences automatically.
    """
    rows = sorted(set(int(l) for l in rows))
    if any(l < 0 for l in rows):
        raise ValueError("l must be >= 0")
    x = np.asarray(x, dtype=np.float64)
    shape = x.shape
    xf = np.abs(x).ravel()
    lmax = rows[-1]
    out = {l: np.zeros(xf.shape) for l in rows}

    zero = xf < 1e-300
    up = (xf > lmax + 2.0) & ~zero
    down = ~up & ~zero

    if np.any(up):
        got = _rows_upward(set(rows), lmax, xf[up])
        for l in rows:
            out[l][up] = got[l]
    if np.any(down):
        if lmax == 0:
            out[0][down] = _j0(xf[down])
        else:
            need = set(rows) | {1}
            got = _rows_downward(need, lmax, xf[down])
            got[0] = _j0(xf[down])
            for l in rows:
                out[l][down] = got[l]
    if np.any(zero) and 0 in rows:
        out[0][zero] = 1.0
    return {l: v.reshape(shape) for l, v in out.items()}


def jl(l, x):
    """Spherical Bessel function j_l(x); l int scalar, x array-like."""
    return jl_rows([int(l)], x)[int(l)]


def jl_d(l, x):
    """First derivative j_l'(x) via j_{l−1} − (l+1)/x · j_l."""
    l = int(l)
    x = np.asarray(x, dtype=np.float64)
    if l == 0:
        return -jl(1, x)
    r = jl_rows([l - 1, l], x)
    xs = np.where(np.abs(x) < 1e-300, 1.0, x)
    return r[l - 1] - (l + 1) / xs * r[l]


def jl_d2(l, x):
    """Second derivative j_l''(x) from the spherical Bessel ODE.

    x² j'' + 2x j' + (x² − l(l+1)) j = 0, so
    j'' = −(2/x) j' + (l(l+1)/x² − 1) j.  This is the ``sphfunc.jl_d2``
    the reference's exact-C_l integrand calls (corr.py:814-816).
    """
    l = int(l)
    x = np.asarray(x, dtype=np.float64)
    if l == 0:
        r = jl_rows([0, 1], x)
        xs = np.where(np.abs(x) < 1e-300, 1.0, x)
        d1 = -r[1]
        return -(2.0 / xs) * d1 - r[0]
    r = jl_rows([l - 1, l], x)
    xs = np.where(np.abs(x) < 1e-300, 1.0, x)
    d1 = r[l - 1] - (l + 1) / xs * r[l]
    return -(2.0 / xs) * d1 + (l * (l + 1) / xs**2 - 1.0) * r[l]
