"""Synthesis-engine tests: clarray, mkfullsky statistics, C_l recovery,
constrained realisations, device C_l fast path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cora_tpu.core import skysim
from cora_tpu.healpix import sht


def _toy_aps(l, z1, z2):
    """Separable SCK-style toy spectrum (broadcasting)."""
    l = np.asarray(l, dtype=np.float64)
    al = np.where(l == 0, 0.0, (np.where(l == 0, 1.0, l) / 100.0) ** -2.4)
    return al * np.exp(-0.5 * (np.log((1 + z1) / (1 + z2))) ** 2 / 0.1**2)


def test_clarray_zromb0():
    za = np.linspace(0.8, 1.2, 8)
    cla = skysim.clarray(_toy_aps, 20, za, zromb=0)
    assert cla.shape == (21, 8, 8)
    assert np.allclose(cla[5, 2, 2], _toy_aps(5, za[2], za[2]))
    # symmetric in (z, z')
    assert np.allclose(cla, np.swapaxes(cla, 1, 2))


def test_clarray_romberg_converges():
    """Channel integration should approach the zromb=0 value for smooth aps
    and narrow channels."""
    za = np.linspace(0.8, 1.2, 8)
    cla0 = skysim.clarray(_toy_aps, 10, za, zromb=0)
    cla3 = skysim.clarray(_toy_aps, 10, za, zromb=3)
    assert np.allclose(cla0[1:], cla3[1:], rtol=3e-2)
    # finite-width averaging must slightly decorrelate neighbouring channels
    assert cla3[5, 0, 1] <= cla0[5, 0, 1] * 1.001


def test_mkfullsky_statistics():
    """Maps drawn from a diagonal C_l must recover it within sample noise."""
    nside, lmax, nz = 16, 47, 4
    l = np.arange(lmax + 1, dtype=np.float64)
    cl = np.where(l < 2, 0.0, (l + 1.0) ** -2)
    corr = np.zeros((lmax + 1, nz, nz))
    for i in range(nz):
        corr[:, i, i] = cl

    key = jax.random.PRNGKey(0)
    maps = skysim.mkfullsky(corr, nside, key=key)
    assert maps.shape == (nz, 12 * nside**2)

    cl_meas = np.asarray(sht.anafast(maps, lmax=lmax, iter=3))
    ratio = cl_meas[:, 10:] / cl[10:]
    # ~4 maps x ~2000 modes -> few-percent accuracy
    assert abs(ratio.mean() - 1) < 0.1


def test_mkfullsky_cross_correlation():
    """Fully correlated channels must produce identical maps."""
    nside, lmax, nz = 16, 20, 3
    l = np.arange(lmax + 1, dtype=np.float64)
    cl = np.where(l < 1, 0.0, l**-2.0)
    corr = np.ones((nz, nz))[None, :, :] * cl[:, None, None]

    maps = skysim.mkfullsky(corr, nside, key=jax.random.PRNGKey(1))
    assert np.allclose(maps[0], maps[1], atol=1e-8 + 1e-5 * maps[0].std())
    assert np.allclose(maps[0], maps[2], atol=1e-8 + 1e-5 * maps[0].std())


def test_mkconstrained():
    """Constrained realisations must reproduce constraint maps exactly."""
    nside, lmax, nz = 8, 23, 5
    l = np.arange(lmax + 1, dtype=np.float64)
    cl = np.where(l < 1, 0.0, (l / 10.0) ** -2.5)
    fc = np.exp(-0.5 * (np.arange(nz)[:, None] - np.arange(nz)[None, :]) ** 2 / 4.0)
    corr = cl[:, None, None] * fc[None]

    # constraint: match a given map at channel 0
    cmap = skysim.mkfullsky(corr, nside, key=jax.random.PRNGKey(2))[0]
    out = skysim.mkconstrained(corr, [(0, cmap)], nside)
    assert out.shape == (nz, 12 * nside**2)

    # the constrained channel must reproduce the constraint map's l>=1
    # harmonic content exactly: synthesize the analysed constraint with
    # the same operator and compare in map space.
    alm_c = np.array(sht.map2alm(cmap, lmax, 3))
    alm_c[0] = 0.0
    expect = np.asarray(sht.alm2map(jnp.asarray(alm_c), nside))
    num = np.abs(out[0] - expect).max()
    assert num < 1e-8 * np.abs(expect).max()


def test_clfast_matches_host():
    """Device C_l fast path must match the host aps evaluation (no window)."""
    from cora_tpu.signal.corr21cm import Corr21cm
    from cora_tpu.signal import clfast
    from cora_tpu import constants

    model = Corr21cm()
    freqs = np.linspace(500.0, 520.0, 8)
    tables = clfast.build_cl_tables(model, freqs, freq_width=1e-8, dtype=np.float64)
    lmax = 64
    cla_dev = np.asarray(clfast.cl_grid(tables, lmax))

    z = constants.nu21 / freqs - 1.0
    cla_host = model.angular_powerspectrum(
        np.arange(lmax + 1)[:, None, None],
        freqs[None, :, None],
        freqs[None, None, :],
    )
    # identical algorithm, different precision path
    sel = slice(1, None)
    assert np.allclose(cla_dev[sel], cla_host[sel], rtol=1e-6)


def test_mkfullsky_streamed_consistency():
    """Chunked streaming generator must be reproducible and chunking-
    invariant for a fixed key."""
    import jax
    from cora_tpu.core.skysim import mkfullsky_streamed

    l = np.arange(48.0)
    nz = 8
    cl = 1e-4 * (1.0 + l) ** -2.0
    x = np.linspace(0, 1, nz)
    corr = cl[:, None, None] * np.exp(
        -0.5 * ((x[:, None] - x[None, :]) / 0.2) ** 2
    )[None]
    key = jax.random.PRNGKey(11)

    a = np.concatenate(
        [m for _, m in mkfullsky_streamed(corr, 16, key=key, fchunk=4)], 0
    )
    b = np.concatenate(
        [m for _, m in mkfullsky_streamed(corr, 16, key=key, fchunk=8)], 0
    )
    assert a.shape == (nz, 12 * 16**2)
    assert np.isfinite(a).all()
    assert np.allclose(a, b, atol=1e-5 * np.abs(a).max())
