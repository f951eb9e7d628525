"""Pallas Legendre-contraction kernel vs the einsum reference (interpret
mode on CPU; the same kernel compiles via Mosaic on real TPUs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cora_tpu.ops.pallas_legendre import legendre_contract_pallas, dense_lambda


def test_pallas_legendre_matches_einsum():
    rng = np.random.RandomState(0)
    F, L, R, M = 4, 16, 16, 16
    lam = rng.randn(L, R, M).astype(np.float32)
    are = rng.randn(F, L, M).astype(np.float32)
    aim = rng.randn(F, L, M).astype(np.float32)

    hre, him = legendre_contract_pallas(
        jnp.asarray(lam), jnp.asarray(are), jnp.asarray(aim),
        r_tile=8, m_tile=8, l_tile=8, interpret=True,
    )
    ref_re = np.einsum("lrm,flm->frm", lam, are)
    ref_im = np.einsum("lrm,flm->frm", lam, aim)
    assert np.abs(np.asarray(hre) - ref_re).max() < 1e-4
    assert np.abs(np.asarray(him) - ref_im).max() < 1e-4


def test_pallas_legendre_against_sht_tables():
    """The dense-Λ pallas contraction must reproduce the packed einsum
    contraction inside the real SHT (pre-mirror accumulators)."""
    from cora_tpu.healpix.sht import SHT, _legendre_contract_cached

    nside, F = 8, 2
    lmax = 3 * nside - 1
    L = lmax + 1
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm", l_chunk=8)
    t = op.tables(False)

    rng = np.random.RandomState(1)
    alm = (rng.randn(F, L, L) + 1j * rng.randn(F, L, L)).astype(np.complex64)
    alm *= np.arange(L)[None, None, :] <= np.arange(L)[None, :, None]

    lam = dense_lambda(op)  # [L, nh, L]
    # pad dims to tile multiples
    pad_m = (-L) % 8
    pad_r = (-op.nhalf) % 8
    lam_p = np.pad(lam, [(0, pad_m), (0, pad_r), (0, pad_m)])
    are = np.pad(alm.real.astype(np.float32), [(0, 0), (0, pad_m), (0, pad_m)])
    aim = np.pad(alm.imag.astype(np.float32), [(0, 0), (0, pad_m), (0, pad_m)])

    hre, him = legendre_contract_pallas(
        jnp.asarray(lam_p), jnp.asarray(are), jnp.asarray(aim),
        r_tile=8, m_tile=8, l_tile=8, interpret=True,
    )
    H = (np.asarray(hre) + 1j * np.asarray(him))[:, : op.nhalf, :L]

    # reference: einsum path H = Ge + Go recombined from the full contraction
    G = np.asarray(_legendre_contract_cached(op, t, jnp.asarray(alm)))
    # H equals the northern-ring rows of G (north = first nh of nring)
    assert np.abs(H - G[:, : op.nhalf, :]).max() < 1e-3 * max(
        1.0, np.abs(G).max()
    )


@pytest.mark.slow
def test_fused_scan_kernel_matches_streamed():
    """ops/pallas_scan_legendre (fused recurrence+contraction kernel,
    interpret mode) matches the production XLA scan path and stays in the
    same accuracy class vs the f64 cached contraction (both ~3-4e-6
    relative at this size — the kernel's rescale cadence and dot
    accumulation order differ, not its math)."""
    import jax
    import jax.numpy as jnp

    from cora_tpu.healpix.sht import (
        SHT, _legendre_contract_scan_streamed, _join_planes,
    )
    from cora_tpu.ops.pallas_scan_legendre import fused_GeGo

    nside, lmax = 16, 47
    L = lmax + 1
    op = SHT(nside, lmax, fft_mode="mm", legendre_mode="scan",
             l_chunk=8, scan_ckpt=True, ckpt_every=2)
    t = op.tables(False)
    rng = np.random.default_rng(0)
    alm = (rng.standard_normal((3, L, L))
           + 1j * rng.standard_normal((3, L, L))).astype(np.complex64)
    li = np.arange(L)[:, None]
    mi = np.arange(L)[None, :]
    alm *= mi <= li
    alm = jnp.asarray(alm)

    def alm_blk(c, l0, nrows, mw):
        blk = jax.lax.dynamic_slice_in_dim(alm, l0, nrows, axis=-2)
        blk = blk[..., :mw]
        return jnp.stack([blk.real, blk.imag], axis=1).astype(jnp.float32)

    Ge_ref, Go_ref = _legendre_contract_scan_streamed(
        op, t, alm_blk, (3, 2), jnp.float32, expand=False
    )
    Ge_ref, Go_ref = _join_planes(Ge_ref), _join_planes(Go_ref)

    Ge, Go = fused_GeGo(op, t, alm, interpret=True, mt=8, rt=8, lb=8)
    sc = float(jnp.max(jnp.abs(Ge_ref)))
    assert float(jnp.max(jnp.abs(Ge - Ge_ref))) < 5e-6 * sc
    assert float(jnp.max(jnp.abs(Go - Go_ref))) < 5e-6 * sc


@pytest.mark.slow
def test_fused_scan_correlated_matches_xla():
    """The production fused-scan path (_fused_scan_GeGo: same fold_in ξ
    stream, materialised m-leading planes, Pallas kernel) must equal the
    XLA scan formulation of _correlated_GeGo_scan to the f32
    accumulation class, through the same tables."""
    from cora_tpu.healpix.sht import (
        SHT, _correlated_GeGo_scan, _fused_scan_GeGo,
    )

    nside = 64
    lmax = 191
    L = lmax + 1
    nz = 4
    op_x = SHT(nside, lmax, l_chunk=128, legendre_mode="scan",
               scan_ckpt=True, ckpt_every=1, fft_mode="mm",
               scan_kernel="xla")
    op_p = SHT(nside, lmax, l_chunk=128, legendre_mode="scan",
               scan_ckpt=True, ckpt_every=1, fft_mode="mm",
               scan_kernel="pallas")
    t_x = op_x.tables(False)
    t_p = op_p.tables(False)

    rng = np.random.RandomState(2)
    roots = jnp.asarray((rng.randn(L, nz, nz) * 0.1).astype(np.float32))
    key = jax.random.PRNGKey(9)

    Ge_x, Go_x = _correlated_GeGo_scan(op_x, t_x, roots, key, 0, nz)

    Lp_chunks = -(-L // op_p.l_chunk) * op_p.l_chunk
    roots_pad = jnp.pad(roots, ((0, Lp_chunks - L), (0, 0), (0, 0)))
    Ge_p, Go_p = _fused_scan_GeGo(op_p, t_p, roots_pad, key, 0, nz,
                                  interpret=True)

    # same ξ stream, different f32 accumulation/rescale cadence: the two
    # paths agree to the scan drift class, and the kernel must be in the
    # SAME accuracy class vs an f64 exact contraction of the same alm
    # (measured here: xla 6.3e-5, pallas 9.1e-5 relative) — quality
    # parity, not bit equality, is the contract.
    sc = float(jnp.max(jnp.abs(Ge_x)))
    assert float(jnp.max(jnp.abs(Ge_p - Ge_x))) < 1e-4 * sc
    assert float(jnp.max(jnp.abs(Go_p - Go_x))) < 1e-4 * sc

    from cora_tpu.healpix.sht import _legendre_contract_cached

    alm = _materialise_alm(op_x, roots, key, nz)
    op64 = SHT(nside, lmax, l_chunk=64, legendre_mode="cached")
    t64 = op64.tables(True)
    G = _legendre_contract_cached(op64, t64, alm.astype(jnp.complex128))
    nh = 2 * nside
    south = G[..., op64.nring - 1 - np.arange(nh), :]
    Ge64 = (G[..., :nh, :] + south) / 2
    sc64 = float(jnp.max(jnp.abs(Ge64)))
    d_x = float(jnp.max(jnp.abs(Ge_x.astype(jnp.complex128) - Ge64)))
    d_p = float(jnp.max(jnp.abs(Ge_p.astype(jnp.complex128) - Ge64)))
    assert d_p < max(1.5 * d_x, 1e-5 * sc64), (d_p / sc64, d_x / sc64)


def _materialise_alm(op, roots, key, nz):
    """The alm realisation the fold_in(key, c) chunk scheme draws."""
    L = op.lmax + 1
    lc = op.l_chunk
    g = op.ckpt_every
    nchunk = -(-L // lc)
    Lp = nchunk * lc
    roots_pad = jnp.pad(roots, ((0, Lp - L), (0, 0), (0, 0)))
    half = jnp.asarray(0.70710678, jnp.float32)
    out = np.zeros((nz, L, L), np.complex64)
    for b in range(-(-nchunk // g)):
        c_lo = b * g
        nc = min(g, nchunk - c_lo)
        mw = min(L, ((min(L, (c_lo + nc) * lc) + 127) // 128) * 128)
        for ci in range(nc):
            c = c_lo + ci
            kc = jax.random.fold_in(key, c)
            kr, ki = jax.random.split(kc)
            shape = (lc, nz, mw)
            xi = (jnp.stack([jax.random.normal(kr, shape, jnp.float32),
                             jax.random.normal(ki, shape, jnp.float32)],
                            axis=2) * half)
            rblk = roots_pad[c * lc:(c + 1) * lc]
            a = jnp.einsum("lzy,lypm->zlpm", rblk, xi)
            nrows = min(lc, L - c * lc)
            blk = np.asarray(a)[:, :nrows]
            out[:, c * lc:c * lc + nrows, :mw] = (
                blk[:, :, 0] + 1j * blk[:, :, 1]
            )[..., :L if mw > L else mw]
    return jnp.asarray(out)


@pytest.mark.slow
def test_fused_scan_project_matches_xla():
    """The fused adjoint kernel (scan_project_fused via
    _fused_scan_project) must match the XLA _legendre_project_scan on
    the same ring spectra — the analysis-side twin of the synthesis
    kernel equality test."""
    from cora_tpu.healpix.sht import (
        SHT, _legendre_project_scan, _fused_scan_project,
    )

    nside = 64
    lmax = 191
    L = lmax + 1
    op_x = SHT(nside, lmax, l_chunk=128, legendre_mode="scan",
               scan_ckpt=True, ckpt_every=1, fft_mode="mm",
               scan_kernel="xla")
    op_p = SHT(nside, lmax, l_chunk=128, legendre_mode="scan",
               scan_ckpt=True, ckpt_every=1, fft_mode="mm",
               scan_kernel="pallas")
    t_x = op_x.tables(False)
    t_p = op_p.tables(False)

    rng = np.random.RandomState(4)
    G = jnp.asarray(
        (rng.randn(2, op_x.nring, L)
         + 1j * rng.randn(2, op_x.nring, L)).astype(np.complex64)
    )

    a_x = _legendre_project_scan(op_x, t_x, G)
    a_p = _fused_scan_project(op_p, t_p, G, interpret=True)
    assert a_p.shape == a_x.shape
    sc = float(jnp.max(jnp.abs(a_x)))
    assert float(jnp.max(jnp.abs(a_p - a_x))) < 1e-4 * sc

    # real-input path (f32 planes caller)
    Gr = jnp.asarray(rng.randn(op_x.nring, L).astype(np.float32))
    ar_x = _legendre_project_scan(op_x, t_x, Gr)
    ar_p = _fused_scan_project(op_p, t_p, Gr, interpret=True)
    scr = float(jnp.max(jnp.abs(ar_x)))
    assert float(jnp.max(jnp.abs(ar_p - ar_x))) < 1e-4 * scr


@pytest.mark.slow
def test_fused_wigner_matches_xla():
    """The fused Wigner kernel (wigner_apply_fused, both directions)
    matches the XLA spin-scan contraction/projection for both spin
    families, within the f32 class (the CPU XLA reference runs f64
    under the suite's x64 config)."""
    from cora_tpu.healpix.spin import SpinSHT

    nside, lmax = 64, 191
    L = lmax + 1
    sop = SpinSHT(nside, lmax, 2, l_chunk=64, legendre_mode="scan")
    assert not sop._use_fused  # CPU: XLA default stays
    nh = 2 * nside

    rng = np.random.RandomState(6)
    alm = jnp.asarray(
        ((rng.randn(2, L, L) + 1j * rng.randn(2, L, L))
         * (np.arange(L)[None, None, :] <= np.arange(L)[None, :, None])
         ).astype(np.complex64)
    )
    G = jnp.asarray(
        (rng.randn(2, nh, L) + 1j * rng.randn(2, nh, L)).astype(
            np.complex64
        )
    )

    for sp in (2, -2):
        ref = sop._contract({}, alm, sp)
        got = sop._contract_fused(alm, sp, interpret=True)
        sc = float(jnp.max(jnp.abs(ref)))
        d = float(jnp.max(jnp.abs(got - ref.astype(got.dtype))))
        assert d < 2e-4 * sc, (sp, d / sc)

        ref_a = sop._project({}, G, sp)
        got_a = sop._project_fused(G, sp, interpret=True)
        sca = float(jnp.max(jnp.abs(ref_a)))
        da = float(jnp.max(jnp.abs(got_a - ref_a.astype(got_a.dtype))))
        assert da < 2e-4 * sca, (sp, da / sca)


def test_cpu_placement_disables_fused_kernels():
    """A CPU-placed call inside an accelerator process must never select
    a Pallas kernel (they only lower on TPU backends).  Regression: in a
    TPU process, ConstrainedGalaxy.getsky -> mkconstrained -> map2alm ran
    under the model_device (CPU) scope but the scan-mode op still carried
    the fused-kernel tables, crashing at lowering with "Only interpret
    mode is supported on CPU backend".  The gate is placement-aware, so
    on this CPU-only tier it must hold even for scan_kernel="pallas"."""
    from cora_tpu.healpix.sht import SHT
    from cora_tpu.healpix.spin import SpinSHT
    from cora_tpu.util.compute import model_device, placement_on_cpu

    with model_device():
        assert placement_on_cpu()

        # force-enable the kernel capability (nside=64 tiles into the
        # kernel's 128-blocks); the *placement* gate must still keep the
        # fused tables out of the CPU table pytree
        op = SHT(64, 191, fft_mode="mm", legendre_mode="scan",
                 l_chunk=64, scan_ckpt=True, ckpt_every=2,
                 scan_kernel="pallas")
        t = op.tables(False)
        assert "psl_rec_a" not in t

        # auto resolution under CPU placement lands on the XLA scan even
        # where the geometry fits the kernel
        op2 = SHT(16, 47, fft_mode="mm", legendre_mode="scan",
                  l_chunk=8, scan_ckpt=True, ckpt_every=2,
                  scan_kernel="auto")
        assert op2.scan_kernel == "xla"
        assert op.tables(False) is t  # placement-keyed cache holds

        # the full analysis path (the call that crashed) runs clean
        rng = np.random.default_rng(3)
        fmap = rng.standard_normal((2, 12 * 16 * 16))
        alm = op2.analysis(jnp.asarray(fmap, jnp.float32), iter=1)
        assert np.all(np.isfinite(np.asarray(alm)))

        # spin twin: CPU-placed tables carry no fused-kernel entries
        sop = SpinSHT(16, 47, 2, l_chunk=8, legendre_mode="scan")
        st = sop.tables(False)
        assert "psl" not in st
