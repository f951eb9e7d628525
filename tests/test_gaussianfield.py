"""Spectral contract of the k-space Gaussian field generator.

The reference never tests gaussianfield directly (its only coverage is
indirect variance ordering through the SCK foregrounds); here the core
normalisation contract of RandomField (reference gaussianfield.py:70-100:
weight = sqrt(P)·N/sqrt(2V)) is verified by recovering the input power
spectrum from the periodogram of a realisation, and the velocity-field
mu^2 filter of the flat-sky lightcone path is checked against its
defining relation in k-space.
"""

import numpy as np
import jax
import pytest

from cora_tpu.core.gaussianfield import RandomField


class _PowerLaw(RandomField):
    def powerspectrum(self, karray):
        k = np.sqrt((karray**2).sum(axis=-1))
        return np.where(k > 0, np.maximum(k, 1e-30) ** -2.0, 0.0)


def test_randomfield_periodogram_recovers_pk():
    """P̂(k) = |FFT(f)|² V/N² recovers the input P(k) bin by bin.

    Each Fourier mode's periodogram is P·χ²/dof; with M modes per |k|
    bin the bin mean has relative scatter ~ sqrt(2/M) (Hermitian pairs
    are not independent), so a 6-sigma band is realisation-robust.
    """
    n = (32, 32, 32)
    w = (100.0, 100.0, 100.0)
    rf = _PowerLaw(npix=n, wsize=w)
    f = rf.getfield(key=jax.random.PRNGKey(42))
    assert f.shape == n
    assert np.isfinite(f).all()

    N = np.prod(n)
    V = np.prod(w)
    F = np.fft.fftn(f)
    pk_hat = np.abs(F) ** 2 * V / N**2

    kvecs = [2 * np.pi * np.fft.fftfreq(ni, d=wi / ni) for ni, wi in zip(n, w)]
    kmag = np.sqrt(
        kvecs[0][:, None, None] ** 2
        + kvecs[1][None, :, None] ** 2
        + kvecs[2][None, None, :] ** 2
    )

    kny = np.pi * min(ni / wi for ni, wi in zip(n, w))
    edges = np.linspace(0.25, 0.9 * kny, 7)
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = (kmag >= lo) & (kmag < hi)
        M = int(sel.sum())
        assert M > 50
        kc = kmag[sel]
        expected = np.mean(kc**-2.0)
        got = pk_hat[sel].mean()
        tol = 6.0 * np.sqrt(2.0 / M)
        assert abs(got / expected - 1.0) < tol, (lo, hi, got, expected, tol)


def test_randomfield_variance_matches_pk_integral():
    """Var(f) = Σ_k P(k)/V over the sampled modes (Parseval)."""
    n = (24, 24, 24)
    w = (50.0, 50.0, 50.0)
    rf = _PowerLaw(npix=n, wsize=w)

    kvecs = [2 * np.pi * np.fft.fftfreq(ni, d=wi / ni) for ni, wi in zip(n, w)]
    kmag = np.sqrt(
        kvecs[0][:, None, None] ** 2
        + kvecs[1][None, :, None] ** 2
        + kvecs[2][None, None, :] ** 2
    )
    pk = np.where(kmag > 0, np.maximum(kmag, 1e-30) ** -2.0, 0.0)
    expect_var = pk.sum() / np.prod(w)

    # average over realisations: single-realisation variance scatters at
    # the level of the largest-mode contributions
    vs = [
        np.var(rf.getfield(key=jax.random.PRNGKey(s))) for s in range(8)
    ]
    got = np.mean(vs)
    assert abs(got / expect_var - 1.0) < 0.2, (got, expect_var)


def test_realisation_dv_velocity_filter():
    """The lightcone velocity field obeys its defining k-space relation.

    _realisation_dv builds dv from the SAME white noise as the density
    with a mu² = (k_par/k)² filter (reference corr.py:562-603): verify
    FFT(dv) == mu² · FFT(delta) mode-by-mode on a small cube.
    """
    from cora_tpu.signal.corr import RedshiftCorrelation

    rc = RedshiftCorrelation(ps_vv=lambda k: np.ones_like(k))
    assert rc._vv_only

    d = np.array([32.0, 32.0, 48.0])
    n = np.array([8, 8, 12])
    df, dv = rc._realisation_dv(d, n, key=jax.random.PRNGKey(3))
    assert df.shape == tuple(n) and dv.shape == tuple(n)

    Fd = np.fft.fftn(df)
    Fv = np.fft.fftn(dv)
    ks = [2 * np.pi * np.fft.fftfreq(ni, d=di / ni) for ni, di in zip(n, d)]
    # line of sight is axis 0 (reference corr.py:600: kvec[..., 0])
    kpar = ks[0][:, None, None] * np.ones(tuple(n))
    k2 = (
        ks[0][:, None, None] ** 2
        + ks[1][None, :, None] ** 2
        + ks[2][None, None, :] ** 2
    )
    mu2 = np.where(k2 > 0, kpar**2 / np.where(k2 > 0, k2, 1.0), 0.0)
    # growth-rate scaling is applied later in `realisation`; at this
    # level dv is exactly the mu^2-filtered density
    assert np.allclose(Fv, mu2 * Fd, rtol=1e-5, atol=1e-6 * np.abs(Fd).max())
