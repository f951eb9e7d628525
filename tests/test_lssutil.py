"""Analytic tests of the LSS estimators and differential operators.

The reference ships no tests for its lssutil module; these pin each
estimator against a case with a closed-form answer:

* pk_flat      — white-noise shells recover the flat P = sigma^2 V_cell
* corrfunc     — a pure-monopole field gives xi(r) = c^2 exactly
* ang_correlation / transfer — y = a x gives r_l = 1, T_l = a
* gradient / laplacian — analytic on r-scaled Y_10
* diff2        — exact for cubics on a non-uniform grid
"""

import numpy as np
import pytest

from cora_tpu.healpix import pixel as hpx
from cora_tpu.signal import lssutil


def test_invert_no_zero():
    x = np.array([0.0, 2.0, -4.0])
    assert np.allclose(lssutil.invert_no_zero(x), [0.0, 0.5, -0.25])


def test_linspace_parser():
    assert np.allclose(
        lssutil.linspace({"start": 0, "stop": 1, "num": 5}), np.linspace(0, 1, 5)
    )
    assert np.allclose(lssutil.linspace([0, 1, 5]), np.linspace(0, 1, 5))
    arr = np.arange(3.0)
    assert lssutil.linspace(arr) is arr
    with pytest.raises(ValueError):
        lssutil.linspace(3)


def test_sinh_interpolate_roundtrip():
    x = np.linspace(0.0, 10.0, 64)
    f = x**2 - 3.0 * x  # crosses zero: log-interp would fail, sinh is fine
    fi = lssutil.sinh_interpolate(x, f, x_t=1.0, f_t=1.0)
    xt = np.linspace(0.5, 9.5, 37)
    assert np.max(np.abs(fi(xt) - (xt**2 - 3 * xt))) < 2e-2


def test_calculate_width_uniform_and_nonuniform():
    c = np.linspace(10.0, 20.0, 11)
    assert np.allclose(lssutil.calculate_width(c), 1.0)
    edges = np.array([0.0, 1.0, 3.0, 6.0, 10.0])
    centres = 0.5 * (edges[1:] + edges[:-1])
    assert np.allclose(lssutil.calculate_width(centres), np.diff(edges))


def test_cutoff_limits():
    # sign=+1: -> 1 well above the cut, -> 0 well below
    assert lssutil.cutoff(1e4, 0.0, 1, 0.2, 1) == pytest.approx(1.0, abs=1e-6)
    assert lssutil.cutoff(1e-4, 0.0, 1, 0.2, 1) == pytest.approx(0.0, abs=1e-6)
    # index exponentiates the profile
    v1 = lssutil.cutoff(2.0, 0.0, 1, 0.5, 1)
    v4 = lssutil.cutoff(2.0, 0.0, 1, 0.5, 4)
    assert v4 == pytest.approx(v1**4, rel=1e-12)


def test_lognormal_transform_stats():
    rng = np.random.RandomState(1)
    f = rng.standard_normal((4, 100000)) * 0.3
    out = lssutil.lognormal_transform(f.copy(), axis=1)
    # exp(g - var/2) - 1 has mean 0 for Gaussian g
    assert np.max(np.abs(out.mean(axis=1))) < 5e-3
    assert out.min() > -1.0  # a density contrast: delta > -1


def test_diff2_cubic_exact():
    rng = np.random.RandomState(2)
    x = np.sort(rng.uniform(0.0, 5.0, 24))
    a, b, c, d = 0.7, -1.3, 2.1, 0.4
    f = a * x**3 + b * x**2 + c * x + d
    want = 6 * a * x + 2 * b
    got = lssutil.diff2(f, x)
    assert np.max(np.abs(got - want)) < 1e-8 * max(1.0, np.abs(want).max())
    # batch axis handling
    f2 = np.stack([f, 2 * f], axis=0)
    got2 = lssutil.diff2(f2, x, axis=1)
    assert np.allclose(got2[1], 2 * got, atol=1e-8)


def _y10_map(nside):
    th, _ = (np.asarray(a) for a in
             hpx.pix2ang(nside, np.arange(hpx.nside2npix(nside))))
    return np.sqrt(3.0 / (4.0 * np.pi)) * np.cos(th), th


def test_gradient_analytic_y10():
    """maps[n] = g(x_n) Y_10: d/dr = g' Y_10, dtheta/r = -g N sin(th)/r."""
    nside = 16
    y10, th = _y10_map(nside)
    x = np.linspace(100.0, 110.0, 6)
    g = x**2
    maps = g[:, None] * y10[None, :]

    grad = lssutil.gradient(maps, x)
    want_r = (2 * x)[:, None] * y10[None, :]
    # np.gradient interior stencil is exact for quadratics; its edge rows
    # are first-order (edge_order=1), so check the interior only
    assert np.max(np.abs(grad[0][1:-1] - want_r[1:-1])) < 1e-6 * np.abs(want_r).max()

    N = np.sqrt(3.0 / (4.0 * np.pi))
    want_th = -(g[:, None] / x[:, None]) * (N * np.sin(th))[None, :]
    err = np.max(np.abs(grad[1] - want_th)) / np.abs(want_th).max()
    assert err < 4e-3  # pixel-quadrature class at the 2-nside band limit
    # m=0 field: no phi gradient
    assert np.max(np.abs(grad[2])) < 4e-3 * np.abs(want_th).max()


def test_laplacian_analytic():
    """lap(r^2 Y_10) = 4 Y_10 (= g'' + 2g'/r - l(l+1) g/r^2 with g = r^2)."""
    nside = 16
    y10, _ = _y10_map(nside)
    x = np.linspace(100.0, 120.0, 12)
    maps = (x**2)[:, None] * y10[None, :]
    lap = lssutil.laplacian(maps, x)
    want = 4.0 * y10
    # interior slices (FD boundary rows are one-sided, still accurate here)
    err = np.max(np.abs(lap[2:-2] - want[None, :])) / np.abs(want).max()
    assert err < 3e-2  # -l(l+1) amplifies the quadrature residual


def test_ang_correlation_and_transfer():
    rng = np.random.RandomState(3)
    nside = 16
    x = rng.standard_normal(hpx.nside2npix(nside)).astype(np.float64)
    y = 0.5 * x
    r = lssutil.ang_correlation(x, y)
    t = lssutil.transfer(x, y)
    assert np.allclose(r[1:], 1.0, atol=1e-4)
    assert np.allclose(t[1:], 2.0, atol=1e-4)


def test_pk_flat_white_noise():
    """White-noise shells recover a flat P(k) = sigma^2 V_cell.

    V_cell = Omega_pix chi_mean^2 dx; the estimator's quadrature is the
    HEALPix pixel sum, accurate to ~1e-3 below l ~ 2 nside, so the check
    averages the low-(kpar, kperp) block over many modes.
    """
    rng = np.random.RandomState(4)
    nside, nshell = 16, 16
    npix = hpx.nside2npix(nside)
    sigma = 1.3
    chi = np.linspace(990.0, 1005.0, nshell)
    maps = sigma * rng.standard_normal((nshell, npix))

    # window=False: the sinc^2 deconvolution corrects shell *integrals*,
    # but synthetic white noise here is thin-shell sampled
    cln, kpar, kperp = lssutil.pk_flat(maps, chi, lmax=2 * nside, window=False)

    dx = np.ptp(chi) / (nshell - 1)
    vcell = (4 * np.pi / npix) * chi.mean() ** 2 * dx
    want = sigma**2 * vcell

    # average over the non-DC radial modes and 2 <= l <= 2 nside
    block = cln[1:, 2:]
    nmodes = block.size * (2 * np.arange(2, 2 * nside + 1) + 1).mean()
    est = block.mean()
    assert abs(est / want - 1.0) < 5.0 / np.sqrt(nmodes) + 0.05

    # cross-spectrum of the map with itself is the auto spectrum
    cln2, _, _ = lssutil.pk_flat(maps, chi, maps2=maps, lmax=2 * nside,
                                 window=False)
    assert np.allclose(cln2, cln, rtol=1e-10, atol=1e-12)


def test_corrfunc_monopole_exact():
    """A constant field has C(theta) = c^2 everywhere: every populated
    separation bin of xi(r) must equal c^2."""
    nside, nshell = 16, 4
    c = 2.5
    chi = np.linspace(500.0, 530.0, nshell)
    maps = np.full((nshell, hpx.nside2npix(nside)), c)
    cf, rc = lssutil.corrfunc(maps, chi, rmax=1200.0, numr=64)
    filled = cf != 0
    assert filled.sum() > 10
    assert np.max(np.abs(cf[filled] - c**2)) < 1e-3 * c**2


def test_corrfunc_white_noise_uncorrelated():
    """White-noise shells: xi(r) ~ 0 away from the zero-lag pixel scale."""
    rng = np.random.RandomState(5)
    nside, nshell = 16, 4
    chi = np.linspace(500.0, 530.0, nshell)
    maps = rng.standard_normal((nshell, hpx.nside2npix(nside)))
    cf, rc = lssutil.corrfunc(maps, chi, rmax=1000.0, numr=32)
    # beyond a few pixel scales (~ chi * pix size ~ 30) xi is noise around 0
    far = rc > 100.0
    vals = cf[far][cf[far] != 0]
    assert np.max(np.abs(vals)) < 0.05
