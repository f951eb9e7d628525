"""Spherical Bessel functions and the exact curved-sky C_l quadrature.

The reference's exact path (cora/signal/corr.py:777 angular_powerspectrum_full)
is dead upstream (missing cora.util.sphfunc, nonexistent
scipy.integrate.chebyshev); cora_tpu ships a working native replacement.
These tests pin it against scipy and against an independent brute-force
Simpson integration.
"""

import numpy as np
import pytest
from scipy.special import spherical_jn

from cora_tpu.util import sphfunc


@pytest.mark.parametrize("l", [0, 1, 2, 5, 20, 100, 300])
def test_jl_vs_scipy(l):
    # spans upward (x > l) and downward-Miller (x < l) regimes incl. the
    # turning-point zone x ~ l
    x = np.concatenate([np.logspace(-3, 3.5, 200), np.linspace(0.5, 900, 150)])
    ref = spherical_jn(l, x)
    scale = np.abs(ref).max()
    assert np.abs(sphfunc.jl(l, x) - ref).max() < 1e-12 * scale

    d1r = spherical_jn(l, x, derivative=True)
    assert np.abs(sphfunc.jl_d(l, x) - d1r).max() < 1e-12 * np.abs(d1r).max()

    xs = np.where(x < 1e-300, 1.0, x)
    d2r = -(2 / xs) * d1r + (l * (l + 1) / xs**2 - 1.0) * ref
    scale2 = np.abs(d2r).max()
    assert np.abs(sphfunc.jl_d2(l, x) - d2r).max() < 1e-9 * scale2


def test_jl_zero_and_parity():
    r = sphfunc.jl_rows([0, 1, 4], np.array([0.0, 2.5]))
    assert r[0][0] == 1.0 and r[1][0] == 0.0 and r[4][0] == 0.0
    assert np.isclose(r[0][1], np.sin(2.5) / 2.5)


def _brute_cl(model, l, z1, z2, nk=300001, kmax=15.0):
    """Independent Simpson integration with scipy Bessel functions."""
    from scipy.integrate import simpson

    b1, b2 = float(model.bias_z(z1)), float(model.bias_z(z2))
    f1, f2 = float(model.growth_rate(z1)), float(model.growth_rate(z2))
    pf1, pf2 = float(model.prefactor(z1)), float(model.prefactor(z2))
    D1 = float(model.growth_factor(z1) / model.growth_factor(model.ps_redshift))
    D2 = float(model.growth_factor(z2) / model.growth_factor(model.ps_redshift))
    x1 = float(model.cosmology.comoving_distance(z1))
    x2 = float(model.cosmology.comoving_distance(z2))
    k = np.linspace(1e-4, kmax, nk)

    def F(chi, b, f):
        x = k * chi
        jlv = spherical_jn(l, x)
        djl = spherical_jn(l, x, derivative=True)
        d2 = -(2 / x) * djl + (l * (l + 1) / x**2 - 1) * jlv
        return b * jlv - f * d2

    integ = k**2 * model.ps_vv(k) * F(x1, b1, f1) * F(x2, b2, f2)
    return simpson(integ, x=k) * D1 * D2 * pf1 * pf2 * 2 / np.pi


def test_exact_cl_vs_bruteforce():
    from cora_tpu.signal.corr21cm import Corr21cm

    m = Corr21cm()
    nu = np.linspace(400.0, 800.0, 64, endpoint=False)
    z = 1420.40575177 / nu - 1.0
    ex = m.angular_powerspectrum_exact(10, z[40], z[40])
    br = _brute_cl(m, 10, z[40], z[40])
    assert abs(ex - br) / abs(br) < 1e-4


@pytest.mark.slow
def test_exact_cl_flat_sky_convergence():
    """Flat-sky (DCT) C_l converges to the exact curved-sky C_l as l grows."""
    from cora_tpu.signal.corr21cm import Corr21cm

    m = Corr21cm()
    nu = np.linspace(400.0, 800.0, 64, endpoint=False)
    z = 1420.40575177 / nu - 1.0
    zz = np.array([z[40]])
    devs = []
    for l in (100, 400):
        ex = m.angular_powerspectrum_exact(l, z[40], z[40])
        ff = float(m.angular_powerspectrum_fft(np.array([l]), zz, zz)[0])
        devs.append(abs(ff / ex - 1.0))
    # measured: 2.6e-3 at l=100, 1.3e-3 at l=400 (BASELINE.md)
    assert devs[0] < 1e-2 and devs[1] < 5e-3
    assert devs[1] < devs[0]  # flat-sky error shrinks with l

    # quadrature self-convergence at doubled node density
    e1 = m.angular_powerspectrum_exact(100, z[40], z[40])
    e2 = m.angular_powerspectrum_exact(100, z[40], z[40], resolution=2.0)
    assert abs(e1 / e2 - 1.0) < 1e-5

    # reference-parity alias
    assert m.angular_powerspectrum_full(100, z[40], z[40]) == e1
