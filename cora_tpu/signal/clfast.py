"""Device-side C_l(nu, nu') evaluation — the TPU-native quadrature path.

The reference computes channel-integrated C_l by Romberg-oversampling the
angular power spectrum in redshift (17× more aps evaluations per channel
pair at the default oversample=3; skysim.py:40-69).  That design is hostile
to accelerators: at Nside=512 × 256 channels it needs ~3e13 table lookups.

The TPU-native redesign folds the channel window into the *kpar* direction
of the DCT lookup table instead: multiplying P(kperp, kpar) by
sinc²(kpar·W/2π) before the DCT performs exact top-hat averaging over a
radial width W — the same mechanism the reference exposes as
``_freq_window`` (corr.py:889-932) but never uses in the synthesis path.
With the window baked into the table, the channel-integrated C_l grid costs
exactly one bilinear gather per (l, nu, nu') triple and runs as a single
jitted program on-device: 1536×256² evaluations in milliseconds.

Accuracy note: the window width W = |dχ/dν|·Δν varies by ~20% across a
2:1 band; we evaluate it at the band centre.  The resulting C_l differ from
the Romberg-in-z integration at the sub-percent level (cross-channel
decorrelation is dominated by the same radial top-hat), well inside the
cosmic-variance recovery contract.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants


def build_cl_tables(model, freqs, freq_width=None, dtype=np.float32):
    """Precompute device tables for fast C_l evaluation of a 21cm-like model.

    Parameters
    ----------
    model : Corr21cm-like
        Must provide ps_vv, cosmology, growth_factor/rate, bias_z,
        prefactor, ps_redshift and the DCT grid parameters.
    freqs : array
        Channel centre frequencies in MHz.
    freq_width : float, optional
        Channel width in MHz (default: spacing of the first two channels).

    Returns
    -------
    dict of host numpy arrays: dd/dv/vv tables and per-channel vectors
    (device_put them for the on-device cl_grid path).
    """
    freqs = np.asarray(freqs, dtype=np.float64)
    if freq_width is None:
        freq_width = np.abs(freqs[1] - freqs[0])

    z = constants.nu21 / freqs - 1.0
    chi = model.cosmology.comoving_distance(z)

    # channel width in comoving distance at band centre
    zc = np.median(z)
    dz = 1e-3
    dchi_dz = (
        model.cosmology.comoving_distance(zc + dz)
        - model.cosmology.comoving_distance(zc - dz)
    ) / (2 * dz)
    dz_dnu = constants.nu21 / np.median(freqs) ** 2
    W = abs(dchi_dz * dz_dnu * freq_width)

    # Build the DCT tables with the sinc² channel window baked in.
    old_window = model._freq_window
    old_cache = model._aps_cache
    model._freq_window = W
    model._aps_cache = False
    model._build_fft_cache()
    tables = dict(
        dd=model._aps_dd.astype(dtype),
        dv=model._aps_dv.astype(dtype),
        vv=model._aps_vv.astype(dtype),
    )
    model._freq_window = old_window
    model._aps_cache = old_cache
    if old_cache:
        model._build_fft_cache()

    D = model.growth_factor(z) / model.growth_factor(model.ps_redshift)
    tables.update(
        chi=chi.astype(dtype),
        D=np.asarray(D).astype(dtype),
        f=np.asarray(model.growth_rate(z)).astype(dtype),
        b=np.asarray(model.bias_z(z)).astype(dtype),
        pf=np.asarray(model.prefactor(z)).astype(dtype),
        grid=np.array(
            [model._kperpmin, model._kperpmax, model._nkperp, model._kparmax],
            dtype=np.float64,
        ).astype(dtype),
    )
    return tables


def _interp2d(arr, x, y):
    """Bilinear gather-lerp (device)."""
    nx, ny = arr.shape
    xx = jnp.clip(x, 0.0, nx - 1e-5)
    yy = jnp.clip(y, 0.0, ny - 1e-5)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, nx - 2)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, ny - 2)
    fx = xx - x0
    fy = yy - y0
    v00 = arr[x0, y0]
    v01 = arr[x0, y0 + 1]
    v10 = arr[x0 + 1, y0]
    v11 = arr[x0 + 1, y0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * (1 - fx) * fy
        + v10 * fx * (1 - fy)
        + v11 * fx * fy
    )


def cl_grid_np(tables, lmax):
    """Host numpy evaluation of the channel-integrated C_l grid.

    Same math as :func:`cl_grid`; use when the accelerator backend should
    not be touched during setup (e.g. the benchmark's one-time table
    build).
    """
    from ..util.bilinear import interp2d_np

    g = np.asarray(tables["grid"], dtype=np.float64)
    kperpmin, kperpmax, nkperp, kparmax = g[0], g[1], g[2], g[3]
    chi = np.asarray(tables["chi"], dtype=np.float64)
    la = np.arange(lmax + 1, dtype=np.float64)
    la[la == 0.0] = 1e-10

    xc = 0.5 * (chi[:, None] + chi[None, :])
    rpar = np.abs(chi[:, None] - chi[None, :])
    y2d = rpar / (np.pi / kparmax)

    D = np.asarray(tables["D"], dtype=np.float64)
    f = np.asarray(tables["f"], dtype=np.float64)
    b = np.asarray(tables["b"], dtype=np.float64)
    pf = np.asarray(tables["pf"], dtype=np.float64)

    A = (D * pf)[:, None] * (D * pf)[None, :]
    bb = b[:, None] * b[None, :]
    fb = f[:, None] * b[None, :] + f[None, :] * b[:, None]
    ff = f[:, None] * f[None, :]

    dd = np.asarray(tables["dd"])
    dv = np.asarray(tables["dv"])
    vv = np.asarray(tables["vv"])

    # chunk over l to bound host memory for large (lmax, nz) grids
    out = np.empty((lmax + 1,) + xc.shape)
    for lo in range(0, lmax + 1, 256):
        hi = min(lmax + 1, lo + 256)
        x = (
            (np.log10(la[lo:hi])[:, None, None] - np.log10(xc * kperpmin)[None])
            / np.log10(kperpmax / kperpmin)
            * (nkperp - 1)
        )
        y = np.broadcast_to(y2d[None], x.shape)
        out[lo:hi] = (A / (xc**2 * np.pi))[None] * (
            bb[None] * interp2d_np(dd, x, y)
            + fb[None] * interp2d_np(dv, x, y)
            + ff[None] * interp2d_np(vv, x, y)
        )
    return out


def cl_grid(tables, lmax):
    """Evaluate the full channel-integrated C_l grid on device.

    Returns cla [lmax+1, nz, nz] in the table dtype; fully jitted.
    """
    kperpmin, kperpmax, nkperp, kparmax = (
        tables["grid"][0],
        tables["grid"][1],
        tables["grid"][2],
        tables["grid"][3],
    )
    chi = tables["chi"]
    nz = chi.shape[0]

    la = jnp.arange(lmax + 1, dtype=chi.dtype)
    la = jnp.where(la == 0.0, 1e-10, la)

    xc = 0.5 * (chi[:, None] + chi[None, :])  # [nz, nz]
    rpar = jnp.abs(chi[:, None] - chi[None, :])

    x = (
        (jnp.log10(la)[:, None, None] - jnp.log10(xc * kperpmin)[None, :, :])
        / jnp.log10(kperpmax / kperpmin)
        * (nkperp - 1)
    )
    y = jnp.broadcast_to(
        (rpar / (jnp.pi / kparmax))[None, :, :], x.shape
    )

    psdd = _interp2d(tables["dd"], x, y)
    psdv = _interp2d(tables["dv"], x, y)
    psvv = _interp2d(tables["vv"], x, y)

    D, f, b, pf = tables["D"], tables["f"], tables["b"], tables["pf"]
    A = (D * pf)[:, None] * (D * pf)[None, :]
    bb = b[:, None] * b[None, :]
    fb = f[:, None] * b[None, :] + f[None, :] * b[:, None]
    ff = f[:, None] * f[None, :]

    return (A / (xc**2 * jnp.pi))[None] * (
        bb[None] * psdd + fb[None] * psdv + ff[None] * psvv
    )
