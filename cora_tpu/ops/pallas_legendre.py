"""Pallas TPU kernel for the Legendre contraction stage of the SHT.

Computes H[f, r, m] = Σ_ℓ λ[ℓ, r, m] · a[f, ℓ, m] — the hot contraction of
the synthesis path (cora_tpu/healpix/sht.py) — as an explicitly pipelined
TPU kernel: the Λ "weights" stream HBM → VMEM in (ℓ, ring, m) tiles via the
grid pipeline (double-buffered by Pallas), the MXU consumes each tile as an
m-lane-batched matmul, and the output tile accumulates in VMEM across the ℓ
grid dimension (zero HBM round-trips for partial sums).

Complex a_lm is handled as (re, im) float32 planes — the backend this
framework targets cannot transfer complex buffers (see util/xfer.py) and
real planes also keep the MXU in its native dtype.

This is an alternative implementation of the einsum path used by default;
`tests/test_pallas.py` checks both in interpreter mode, and the kernel is
verified on real TPU hardware (v5e: max err 4e-6 relative at
r/m_tile=128, l_tile=64 — Mosaic needs the batch dim leading and a raised
VMEM budget for the double-buffered Λ tiles).  Unlike the einsum path it
takes the Λ table as one dense [L, nh, L] tensor (no ragged
m-truncation), trading memory for a single static pipeline.

MEASURED VERDICT (round 2, real v5e — tools/pallas_vs_einsum.py, numbers
in BASELINE.md): at matched dense semantics (nside=256, f32 HIGHEST) the
XLA einsum runs 6.04 ms/iter vs 10.69 ms for this kernel — XLA's own
tiling of `lrm,flm->frm` beats the hand pipeline by 1.77×.  The
production SHT therefore keeps the parity-packed ragged einsum path
(chosen for memory: dense Λ at nside=512 is ~18 GiB); this kernel is
retained as a documented, tested experiment.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lam_ref, are_ref, aim_ref, hre_ref, him_ref):
    """One (r-tile, m-tile, ℓ-tile) grid step.

    lam_ref: [LT, RT, MT] f32 — Λ tile
    are/aim: [F, LT, MT] f32 — a_lm tile (re/im planes)
    hre/him: [F, RT, MT] f32 — output tile, accumulated over the ℓ grid dim
    """
    l_step = pl.program_id(2)

    @pl.when(l_step == 0)
    def _():
        hre_ref[:] = jnp.zeros_like(hre_ref)
        him_ref[:] = jnp.zeros_like(him_ref)

    # Mosaic requires batch dims at position 0 — transpose tiles m-major
    # in VMEM, batch-matmul, transpose back.
    lam = jnp.transpose(lam_ref[:], (2, 0, 1))  # [MT, LT, RT]
    are = jnp.transpose(are_ref[:], (2, 0, 1))  # [MT, F, LT]
    aim = jnp.transpose(aim_ref[:], (2, 0, 1))
    dn = (((2,), (1,)), ((0,), (0,)))  # contract LT; batch MT (pos 0)
    # full-f32 MXU passes (TPU default is bf16 — ~1e-2 relative error)
    xre = jax.lax.dot_general(
        are, lam, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    xim = jax.lax.dot_general(
        aim, lam, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    hre_ref[:] += jnp.transpose(xre, (1, 2, 0))
    him_ref[:] += jnp.transpose(xim, (1, 2, 0))


@functools.partial(
    jax.jit,
    static_argnames=("r_tile", "m_tile", "l_tile", "interpret"),
)
def legendre_contract_pallas(
    lam, a_re, a_im, r_tile=128, m_tile=128, l_tile=128, interpret=False
):
    """H[f, r, m] = Σ_ℓ λ[ℓ, r, m]·a[f, ℓ, m], Pallas TPU pipeline.

    Parameters
    ----------
    lam : [L, R, M] float32 dense Λ table (R = northern rings).
    a_re, a_im : [F, L, M] float32 planes of the a_lm block.

    Returns
    -------
    (H_re, H_im) : [F, R, M] float32 planes.
    """
    L, R, M = lam.shape
    F = a_re.shape[0]
    if (L % l_tile) or (R % r_tile) or (M % m_tile):
        raise ValueError("dims must divide the tile sizes")

    grid = (R // r_tile, M // m_tile, L // l_tile)

    lam_spec = pl.BlockSpec(
        (l_tile, r_tile, m_tile),
        lambda r, m, l: (l, r, m),
    )
    a_spec = pl.BlockSpec(
        (F, l_tile, m_tile),
        lambda r, m, l: (0, l, m),
    )
    out_spec = pl.BlockSpec(
        (F, r_tile, m_tile),
        lambda r, m, l: (0, r, m),
    )

    out_shape = [
        jax.ShapeDtypeStruct((F, R, M), jnp.float32),
        jax.ShapeDtypeStruct((F, R, M), jnp.float32),
    ]

    flops = 4 * F * L * R * M  # two real contractions
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[lam_spec, a_spec, a_spec],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (L * R * M + 2 * F * L * M + 2 * F * R * M),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lam, a_re, a_im)


def dense_lambda(op):
    """Dense [L, nh, L] Λ table from an SHT operator's packed chunks.

    Host-side helper for the Pallas path (memory: 4·L²·nh bytes — use at
    moderate nside or on multi-chip setups with Λ sharded over rings).
    """
    L = op.lmax + 1
    nh = op.nhalf
    lam = np.zeros((L, nh, L), dtype=np.float32)
    for (parity, sub_lo, nrows, _), chunk in zip(op._lam_meta, op._lam_host):
        for i in range(nrows):
            ell = parity + 2 * (sub_lo + i)
            mw = min(chunk.shape[-1], L)
            lam[ell, :, :mw] = chunk[i, :, :mw]
    return lam
