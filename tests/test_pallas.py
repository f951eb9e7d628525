"""Pallas Legendre-contraction kernel vs the einsum reference (interpret
mode on CPU; the same kernel compiles via Mosaic on real TPUs)."""

import numpy as np
import jax
import jax.numpy as jnp

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
