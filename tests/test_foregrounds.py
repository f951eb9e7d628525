"""Foreground model tests, mirroring the reference statistical-band strategy
(reference tests/test_maps.py + test_poisson.py)."""

import numpy as np
import pytest

from cora_tpu.foreground import poisson, gaussianfg, pointsource, galaxy, lofar


def test_poisson_inhomogeneous():
    """Mean/std bounds of the inhomogeneous sampler (reference
    tests/test_poisson.py:8-24)."""
    rng = np.random.default_rng(0)

    def rate(t):
        return 300.0 * np.exp(-((t - 1.6) ** 2))

    events = poisson.inhomogeneous_process_approx(5.0, rate, rng=rng)
    assert 1.6 - 0.1 < events.mean() < 1.75
    # std of a unit-variance gaussian-rate process truncated to [0, 5]
    assert 0.6 < events.std() < 0.85


def test_poisson_homogeneous():
    rng = np.random.default_rng(1)
    ev = poisson.homogeneous_process(1000.0, 5.0, rng=rng)
    assert abs(len(ev) / 5000.0 - 1) < 0.05
    assert (np.diff(ev) > 0).all()


def test_synchrotron_aps_golden():
    """Closed-form SCK synchrotron C_l values (upstream golden constants,
    reference tests/test_corr.py:34-57 — these are analytic and match the
    upstream-pinned values exactly)."""
    cr = galaxy.FullSkySynchrotron()
    aps1 = cr.angular_powerspectrum(np.arange(1000), 800.0, 800.0)
    assert len(aps1) == 1000
    assert np.allclose(aps1.sum(), 75.47681191093129, rtol=1e-7)

    fa = np.linspace(400.0, 800.0, 64)
    aps2 = cr.angular_powerspectrum(
        np.arange(1000)[:, None, None], fa[None, :, None], fa[None, None, :]
    )
    assert aps2.shape == (1000, 64, 64)
    assert np.allclose(aps2[400, 40, 40], 9.690708728692975e-06, rtol=1e-7)
    assert np.allclose(aps2[200, 10, 40], 0.00017630767166797886, rtol=1e-7)


def test_sck_flat_field():
    """SCK flat-sky generator produces the right variance ordering."""
    fg = gaussianfg.Synchrotron()
    fg.x_num = fg.y_num = 32
    fg.nu_num = 4
    fg.nu_lower, fg.nu_upper = 400.0, 500.0
    import jax

    cube = fg.getfield(key=jax.random.PRNGKey(0))
    assert cube.shape == (4, 32, 32)
    assert np.isfinite(cube).all()
    # lower frequencies are brighter for alpha > 0
    assert cube[0].std() > cube[-1].std()


def test_pointsource_population():
    ps = pointsource.DiMatteo()
    ps.seed = 0
    ps.flux_min = 0.1
    ps.flux_max = 4.0
    fluxes = ps.generate_population(4 * np.pi)
    assert (fluxes >= 0.1).all() and (fluxes <= 4.0).all()
    # expected count from the integrated source counts
    from scipy.integrate import quad

    expect = 4 * np.pi * quad(ps.source_count, 0.1, 4.0)[0]
    assert abs(len(fluxes) / expect - 1) < 0.1


def test_combined_pointsources_band():
    """Map std bands per reference tests/test_maps.py:37-58."""
    ps = pointsource.CombinedPointSources()
    ps.nside = 32
    ps.frequencies = np.linspace(400.0, 500.0, 16)
    ps.seed = 2

    cs = ps.getpolsky()
    std_I = cs[:, 0].std(axis=-1)
    assert (std_I > 3.0).all() and (std_I < 15.0).all()
    std_Q = cs[:, 1].std(axis=-1)
    std_U = cs[:, 2].std(axis=-1)
    assert (std_Q > 0.005).all() and (std_Q < 0.015).all()
    assert (std_U > 0.005).all() and (std_U < 0.015).all()
    assert (cs[:, 3] == 0.0).all()


@pytest.mark.slow
def test_galaxy_band():
    """Galaxy map statistical bands (reference tests/test_maps.py:12-33).

    Note: the sky data maps are synthetic stand-ins (tools/make_skydata.py),
    so the bands are checked at the same order of magnitude.
    """
    gal = galaxy.ConstrainedGalaxy()
    gal.nside = 32
    gal.frequencies = np.linspace(400.0, 500.0, 16)
    gal.seed = 3
    gal._maxphi = 50.0  # shrink the Faraday screen grid for test speed

    cs = gal.getpolsky()
    std_I = cs[:, 0].std(axis=-1)
    assert (std_I > 10.0).all() and (std_I < 100.0).all()

    std_Q = cs[:, 1].std(axis=-1)
    std_U = cs[:, 2].std(axis=-1)
    assert (std_Q > 0.05).all() and (std_Q < 10.0).all()
    assert (std_U > 0.05).all() and (std_U < 10.0).all()
    assert (cs[:, 3] == 0.0).all()


def test_lofar_cube():
    import jax

    lf = lofar.LofarGDSE()
    lf.x_num = lf.y_num = 16
    lf.nu_num = 4
    lf.nu_lower, lf.nu_upper = 120.0, 180.0
    cube = lf.getfield(key=jax.random.PRNGKey(5))
    assert cube.shape == (4, 16, 16)
    assert np.isfinite(cube).all()
    # synchrotron: brighter at lower frequency
    assert cube[0].mean() > cube[-1].mean()


def test_faraday_rotate_preserves_power():
    rng = np.random.default_rng(7)
    nfreq, npix = 3, 48
    m = np.zeros((nfreq, 4, npix))
    m[:, 1] = rng.standard_normal((nfreq, npix))
    m[:, 2] = rng.standard_normal((nfreq, npix))
    P0 = m[:, 1] ** 2 + m[:, 2] ** 2
    rm = rng.standard_normal(npix) * 10
    pointsource.faraday_rotate(m, rm, np.array([400.0, 600.0, 800.0]))
    P1 = m[:, 1] ** 2 + m[:, 2] ** 2
    assert np.allclose(P0, P1)


def test_skydata_loader_env_override(tmp_path, monkeypatch):
    """CORA_TPU_SKYDATA points at a drop-in (upstream-schema) blob."""
    from cora_tpu.foreground import skydata

    nside = 4
    npix = 12 * nside * nside
    rng = np.random.default_rng(0)
    blob = {k: rng.standard_normal(npix) for k in skydata.REQUIRED_KEYS}
    blob["haslam"] = np.abs(blob["haslam"]) + 20.0
    path = tmp_path / "skydata.npz"
    np.savez(path, **blob)

    monkeypatch.setenv("CORA_TPU_SKYDATA", str(path))
    data = skydata.load_skydata()
    assert data["haslam"].shape == (npix,)
    np.testing.assert_allclose(data["faraday"], blob["faraday"])

    # missing keys must raise with a schema message
    bad = tmp_path / "bad.npz"
    np.savez(bad, haslam=blob["haslam"])
    monkeypatch.setenv("CORA_TPU_SKYDATA", str(bad))
    with pytest.raises(KeyError):
        skydata.load_skydata()

    # default (shipped) blob still loads
    monkeypatch.delenv("CORA_TPU_SKYDATA")
    shipped = skydata.load_skydata()
    assert set(skydata.REQUIRED_KEYS) <= set(shipped)
