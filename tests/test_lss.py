"""LSS pipeline tests: FFTLog pairs, quadrature recovery, task chain,
SPH gridder conservation, containers round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cora_tpu.signal import corrfunc, lss, lssutil, lssmodels


def test_fftlog_gaussian_pair():
    """P(k) = e^{-k²/2} ↔ ξ(r) = (2π)^{-3/2} e^{-r²/2} (analytic pair)."""
    k = np.logspace(-4, 3, 2048)
    r, xi = corrfunc.p2xi(k, np.exp(-0.5 * k**2), 0)
    expect = (2 * np.pi) ** -1.5 * np.exp(-0.5 * r**2)
    sel = (r > 0.05) & (r < 6)
    assert np.abs(xi[sel] - expect[sel]).max() / expect.max() < 1e-6


def test_fftlog_quadrupole():
    """ξ_2 against direct spherical-Bessel quadrature."""
    from scipy.integrate import quad
    from scipy.special import spherical_jn

    k = np.logspace(-4, 3, 2048)
    r, xi2 = corrfunc.p2xi(k, np.exp(-0.5 * k**2), 2)
    for rt in [0.5, 1.5, 3.0]:
        truth = (
            quad(
                lambda kk: kk**2 * np.exp(-0.5 * kk**2) * spherical_jn(2, kk * rt),
                0,
                30,
                limit=200,
            )[0]
            / (2 * np.pi**2)
        )
        idx = np.argmin(np.abs(r - rt))
        assert abs(xi2[idx] / truth - 1) < 5e-3


def test_richardson():
    """Richardson extrapolation cancels the leading error terms."""
    # estimate of pi via perimeter-like sequence with h^2 error
    hs = [0.1 / 2**i for i in range(4)]
    est = [np.pi + 3 * h**2 + 0.5 * h**4 for h in hs]
    out = corrfunc.richardson(est, 2.0, base_pow=2)
    assert abs(out - np.pi) < 1e-10


def test_corr_to_clarray_recovery():
    """Band-limited C_l recovery through the GL quadrature."""
    from scipy.special import eval_legendre

    cl_true = np.zeros(33)
    cl_true[2:21] = 1e-4 * (np.arange(2, 21) / 10.0) ** -2
    chi0 = 2000.0

    def xi_f(r):
        mu = np.clip(1 - r**2 / (2 * chi0**2), -1, 1)
        out = np.zeros_like(mu)
        for l in range(2, 21):
            out += (2 * l + 1) / (4 * np.pi) * cl_true[l] * eval_legendre(l, mu)
        return out

    cl = corrfunc.corr_to_clarray(xi_f, 32, np.array([chi0]), xromb=0)
    sel = np.arange(2, 21)
    assert np.abs(cl[sel, 0, 0] / cl_true[sel] - 1).max() < 1e-3


def test_legendre_array():
    from scipy.special import eval_legendre

    mu = np.linspace(-1, 1, 21)
    lm = corrfunc.legendre_array(10, mu)
    for l in [0, 1, 5, 10]:
        assert np.allclose(lm[l], eval_legendre(l, mu))


def test_sph_gridder_conservation():
    """Zero displacement keeps the field; mass is exactly conserved."""
    from cora_tpu.ops import pmesh as P

    nside, nchi = 8, 6
    npix = 12 * nside**2
    chi = np.linspace(2000, 2100, nchi)
    rng = np.random.RandomState(0)
    db = 0.1 * rng.randn(nchi, npix)

    out = np.asarray(
        P.za_density_sph(
            jnp.zeros((3, nchi, npix)),
            jnp.asarray(db),
            jnp.zeros((nchi, npix)),
            jnp.asarray(chi),
            nside,
        )
    )
    assert abs(out.sum() - db.sum()) < 1e-8 * npix
    # smoothing: correlated with input, reduced variance
    assert np.corrcoef(out.ravel(), db.ravel())[0, 1] > 0.8
    assert out.std() < db.std()


def test_sph_gridder_descending_chi():
    """Frequency-ordered (descending chi) input must work identically."""
    from cora_tpu.ops import pmesh as P

    nside, nchi = 8, 6
    npix = 12 * nside**2
    chi = np.linspace(2000, 2100, nchi)
    rng = np.random.RandomState(1)
    db = 0.1 * rng.randn(nchi, npix)
    psi = 0.5 * rng.randn(3, nchi, npix)
    psi[1:] *= 0.01

    out_asc = np.asarray(
        P.za_density_sph(
            jnp.asarray(psi), jnp.asarray(db), jnp.zeros((nchi, npix)),
            jnp.asarray(chi), nside,
        )
    )
    out_desc = np.asarray(
        P.za_density_sph(
            jnp.asarray(psi[:, ::-1].copy()),
            jnp.asarray(db[::-1].copy()),
            jnp.zeros((nchi, npix)),
            jnp.asarray(chi[::-1].copy()),
            nside,
        )
    )
    assert np.allclose(out_desc[::-1], out_asc)


def test_fog_kernel():
    """FoG kernel rows sum to D_i/D_j-weighted unity; limits are sane."""
    chi = np.linspace(2000, 2200, 32)
    K = lssutil.exponential_FoG_kernel(chi, 5.0, 1.0)
    assert np.allclose(K.sum(axis=1), 1.0)
    # small sigma -> nearly identity
    K2 = lssutil.exponential_FoG_kernel(chi, 0.1, 1.0)
    assert np.diagonal(K2).min() > 0.99


def test_lssmodels():
    assert abs(lssmodels.bias["HI"](1.0) - 0.489) < 1e-10
    assert np.allclose(
        lssmodels.bias.evaluate(np.array([0.5, 1.5]), model="eboss_qso"),
        [0.195495, 1.309695],
    )
    from cora_tpu.cosmology import Cosmology

    Tb = lssmodels.mean_21cm_temperature(Cosmology(), 1.0, 6e-4)
    assert 1e-4 < Tb < 1e-3  # ~0.1-0.3 mK in K


@pytest.fixture(scope="module")
def small_chain():
    cc = lss.CalculateCorrelations.from_config({"samples_per_decade": 100})
    cc.setup()
    corr = cc.process()
    aps = lss.CalculateMultiFrequencyAngularPowerSpectrum.from_config(
        {"nside": 8, "frequencies": [500.0, 550.0, 8], "xromb": 1}
    ).process(corr)
    gen = lss.GenerateInitialLSSFromCl.from_config({"num_sims": 1, "start_seed": 1})
    gen.setup(aps)
    init = gen.process()
    return corr, aps, init


@pytest.mark.slow
def test_initial_lss(small_chain):
    corr, aps, init = small_chain
    assert init.delta.shape == (8, 768)
    assert np.isfinite(init.delta).all() and np.isfinite(init.phi).all()
    # potential is much smoother/larger than density
    assert init.phi.std() > 10 * init.delta.std()


def test_dynamics_chain(small_chain):
    corr, aps, init = small_chain
    bias = lss.GeneratePolynomialBias.from_config({"model": "HI"})
    bias.setup()
    bf = bias.process(init)

    zd = lss.ZeldovichDynamics.from_config({"sph": True})
    final = zd.process(init, bf)
    assert abs(final.delta.mean()) < 1e-2
    assert np.isfinite(final.delta).all()

    ld = lss.LinearDynamics.from_config({})
    final2 = ld.process(init, bf)
    assert np.isfinite(final2.delta).all()

    fog = lss.FingersOfGod.from_config({"model": "HI"})
    fog.setup()
    sm = fog.process(final)
    assert np.isfinite(sm.delta).all()

    sn = lss.AddCorrelatedShotNoise.from_config({"log_M_HI_g": 10.0})
    sn.setup(init)
    wn = sn.process(sm)

    tomap = lss.BiasedLSSToMap.from_config({"use_mean_21cmT": True})
    m = tomap.process(wn)
    assert m.map.shape == (8, 4, 768)
    assert np.isfinite(m.map).all()


def test_container_roundtrip(tmp_path, small_chain):
    corr, aps, init = small_chain
    fname = str(tmp_path / "init.h5")
    init.save(fname)

    from cora_tpu.signal.lsscontainers import InitialLSS

    loaded = InitialLSS.from_file(fname)
    assert np.allclose(loaded.delta, init.delta)
    assert np.allclose(loaded.chi, init.chi)
    assert loaded.cosmology.H0 == init.cosmology.H0


@pytest.mark.slow
def test_yaml_pipeline(tmp_path):
    """The YAML pipeline runner drives the task DAG end to end."""
    from cora_tpu.pipeline import Pipeline

    yaml_conf = """
pipeline:
  tasks:
    - type: cora_tpu.signal.lss.CalculateCorrelations
      out: corr
      params:
        samples_per_decade: 100
    - type: cora_tpu.signal.lss.GenerateInitialLSS
      requires: corr
      out: initial
      params:
        nside: 8
        frequencies: [500.0, 550.0, 8]
        xromb: 1
        num_sims: 1
    - type: cora_tpu.signal.lss.GenerateConstantBias
      in: initial
      out: biased
      params:
        bias_L: 0.5
"""
    products = Pipeline.from_yaml(yaml_conf).run()
    assert len(products["initial"]) == 1
    assert len(products["biased"]) == 1
    assert np.isfinite(products["biased"][0].delta).all()


def test_flat_spectrum_map():
    task = lss.GenerateFlatSpectrumMap.from_config(
        {"nside": 8, "frequencies": [500.0, 550.0, 4], "P_SN": 1e-6, "seed": 0}
    )
    task.setup()
    m = task.process()
    assert m.map.shape[0] == 4
    assert m.map[:, 0].std() > 0
    assert (m.map[:, 1:] == 0).all()


def test_flat_spectrum_map_mesh_invariant():
    """Mesh fill: identical on any mesh size, correct amplitude."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = {"nside": 8, "frequencies": [500.0, 550.0, 8], "P_SN": 1e-6,
           "seed": 3}
    outs = []
    for n in (2, -1):
        task = lss.GenerateFlatSpectrumMap.from_config(
            dict(cfg, mesh_devices=n)
        )
        task.setup()
        outs.append(task.process().map[:])
    assert np.array_equal(outs[0], outs[1])
    assert outs[0][:, 0].std() > 0


@pytest.mark.slow
def test_yaml_pipeline_full_chain(tmp_path):
    """The docs' full ZA chain (two-input ZeldovichDynamics via `in` lists,
    stage save) runs from YAML end to end."""
    from cora_tpu.pipeline import Pipeline

    yaml_conf = """
pipeline:
  tasks:
    - type: cora_tpu.signal.lss.CalculateCorrelations
      out: corr
      params:
        samples_per_decade: 100
    - type: cora_tpu.signal.lss.CalculateMultiFrequencyAngularPowerSpectrum
      in: corr
      out: aps
      params:
        nside: 8
        frequencies: [500.0, 550.0, 8]
        xromb: 1
    - type: cora_tpu.signal.lss.GenerateInitialLSSFromCl
      requires: aps
      out: initial
      params:
        num_sims: 1
        start_seed: 11
    - type: cora_tpu.signal.lss.GeneratePolynomialBias
      in: initial
      out: biased
      params:
        model: HI
    - type: cora_tpu.signal.lss.ZeldovichDynamics
      in: [initial, biased]
      out: final
    - type: cora_tpu.signal.lss.BiasedLSSToMap
      in: final
      out: map
      save: "SAVEDIR/lss_map_{count}.h5"
""".replace("SAVEDIR", str(tmp_path))
    products = Pipeline.from_yaml(yaml_conf).run()
    m = products["map"][0]
    assert m.map.shape == (8, 4, 768)
    assert np.isfinite(np.asarray(m.map)).all()
    assert (tmp_path / "lss_map_0.h5").exists()


@pytest.mark.parametrize(
    "sig_r",
    [
        4.0,
        # 25: ~5% of particles exit the ±3-bin window — exercises the
        # radial-outlier fallback; slow tier (second full compile of the
        # deposit program costs ~12 s on a 1-core box)
        pytest.param(25.0, marks=pytest.mark.slow),
    ],
)
def test_sph_deposit_variants_match_scatter(sig_r):
    """window and offset deposits reproduce the scatter-add exactly
    (different summation order only), including radial-outlier fallback
    paths; overflow of the fallback capacity poisons with NaN rather
    than dropping mass."""
    import jax

    from cora_tpu.ops import pmesh
    from cora_tpu.healpix import pixel as hpx

    nside = 32
    npix = hpx.nside2npix(nside)
    nchi = 8
    rng = np.random.RandomState(1)
    chi = np.linspace(1500.0, 1640.0, nchi)
    psi = (rng.standard_normal((3, nchi, npix)) * 0.01).astype(np.float32)
    psi[0] = (rng.standard_normal((nchi, npix)) * sig_r).astype(np.float32)
    db = (rng.standard_normal((nchi, npix)) * 0.3).astype(np.float32)
    dm = (rng.standard_normal((nchi, npix)) * 0.3).astype(np.float32)
    a = np.asarray(
        pmesh.za_density_sph(psi, db, dm, chi, nside, deposit="scatter")
    )
    for dep in ("window", "offset"):
        b = np.asarray(
            pmesh.za_density_sph(psi, db, dm, chi, nside, deposit=dep)
        )
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 2e-6 * np.abs(a).max(), dep


def test_stencil_deposit_matches_scatter():
    """deposit="stencil" (belt roll-adds + cap scatter) equals the
    scatter deposit exactly (same adds, different order)."""
    from cora_tpu.ops import pmesh

    nside, nchi = 8, 16
    npix = 12 * nside**2
    chi = np.linspace(900.0, 1000.0, nchi)
    rng = np.random.default_rng(3)
    dchi = float(np.mean(np.diff(chi)))
    res = 1.0 / nside
    psi = np.stack([
        0.3 * dchi * rng.standard_normal((nchi, npix)),
        0.3 * res * rng.standard_normal((nchi, npix)),
        0.3 * res * rng.standard_normal((nchi, npix)),
    ])
    db = 0.1 * rng.standard_normal((nchi, npix))
    dm = 0.1 * rng.standard_normal((nchi, npix))
    args = (jnp.asarray(psi), jnp.asarray(db), jnp.asarray(dm),
            jnp.asarray(chi), nside)
    ref = np.asarray(pmesh.za_density_sph(*args, deposit="scatter"))
    got = np.asarray(pmesh.za_density_sph(*args, deposit="stencil"))
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() < 1e-10 * np.abs(ref).max()


def test_stencil_deposit_poisons_on_window_overflow():
    """Belt updates beyond the stencil ranges must poison, not drop."""
    from cora_tpu.ops import pmesh

    nside, nchi = 8, 16
    npix = 12 * nside**2
    chi = np.linspace(900.0, 1000.0, nchi)
    dchi = float(np.mean(np.diff(chi)))
    psi = np.zeros((3, nchi, npix))
    psi[0] = 8.0 * dchi  # far beyond KR=4
    out = np.asarray(pmesh.za_density_sph(
        jnp.asarray(psi), jnp.zeros((nchi, npix)), jnp.zeros((nchi, npix)),
        jnp.asarray(chi), nside, deposit="stencil",
    ))
    assert np.isnan(out).any()
