"""Fused recurrence + contraction Pallas kernel for the scan-mode SHT.

The Λ-free scan path (cora_tpu/healpix/sht.py, legendre_mode="scan" —
the per-device Legendre stage of every nside ≥ 1024 config) generates
associated-Legendre rows by the scaled three-term recurrence and
contracts them with a_lm per ℓ-chunk.  The XLA formulation has a
measured floor of ~0.21 s at nside=512 (tools/scan_binder_512*.out):
the contraction part alone sits at ~30% of HBM peak and the recurrence
part pays HBM carry round trips — and every incremental restructuring
(row unroll, deferred selects, band-local accumulators, K-doubling,
precision, m-major relayout) measured ≤3%.

This kernel removes the HBM λ intermediate entirely: for each
(m-tile, ring-tile) the recurrence carry lives in VMEM scratch across
the whole ℓ sweep, λ parity blocks are staged in VMEM, consumed
immediately by batch-leading MXU dots, and the H accumulators persist
in VMEM until one final write per tile.  HBM traffic is then just the
a_lm planes (streamed per ℓ-block), the small seed/recurrence tables,
and one write of H — the λ triangle (38 GB at nside=1024) never exists.

Scaled-recurrence semantics match sht._scaled_lam_step with the
rescale check amortised over row pairs (emitted-zero bound ~2^-27,
below f32 accumulation precision; see sht._lam_scan_rows), including
the checkpoint re-seeding at band starts (sht._ck_override).

Replaces the per-transform CPU Legendre recurrences of the reference's
libsharp engine (wrapped at /root/reference/cora/util/hputil.py:195+)
with an on-accelerator fused generate-and-contract pipeline.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 scaled-recurrence constants (sht._lam_scale_params)
_SCALE_S = 60.0
_SCALE_BETA = 30.0
_CK_USE_TH = 2.0**-20


def _kernel(rec_ab_ref, seed_ref, k0_ref, z_ref, ck_ref,
            alm0_ref, alm1_ref, he_ref, ho_ref,
            lam_p, lam_pp, kcnt, scr0, scr1,
            *, lb, band_blocks, n_l, use_ck):
    """One (i_m, i_r, i_l) grid step.

    rec_ab_ref: [2, LB, MT]  recurrence a/b rows for this ℓ-block
    seed_ref, k0_ref: [MT, RT]  pre-scaled λ_mm seeds / scale counts
    z_ref: [1, RT]  cosθ of the tile's rings
    ck_ref: [1, 2, MT, RT]  checkpoint rows (λ_{l0-2}, λ_{l0-1})
    alm0/1_ref: [F2, LB//2, MT]  even/odd-ℓ a_lm planes (m minor: the
        plane count F2 is small and unaligned — lane-padding a minor F2
        cost 16× HBM at nside=2048, tools/scan_2048_noring.out)
    he/ho_ref: [F2, RT, MT]  output tiles, accumulated across ℓ-blocks
    scratch: carries [MT, RT] ×3, λ parity stages [LB//2, MT, RT] ×2;
    the output tiles themselves accumulate across ℓ-blocks (their index
    map ignores i_l, so they stay VMEM-resident until the final write).
    """
    i_m = pl.program_id(0)
    i_l = pl.program_id(2)
    mt = seed_ref.shape[0]
    lbe = lb // 2

    l0 = i_l * lb
    m0 = i_m * mt

    @pl.when(i_l == 0)
    def _init():
        lam_p[:] = jnp.zeros_like(lam_p)
        lam_pp[:] = jnp.zeros_like(lam_pp)
        kcnt[:] = jnp.zeros_like(kcnt)
        he_ref[:] = jnp.zeros_like(he_ref)
        ho_ref[:] = jnp.zeros_like(ho_ref)

    # checkpoint re-seeding at band starts (exact rows where available);
    # statically absent when the op carries no checkpoint tables (the
    # dummy ck input is then a single zero block)
    if use_ck:
        @pl.when((i_l % band_blocks == 0) & (i_l > 0))
        def _ck():
            c0 = ck_ref[0, 0]
            c1 = ck_ref[0, 1]
            use = (jnp.abs(c0) > _CK_USE_TH) & (jnp.abs(c1) > _CK_USE_TH)
            lam_pp[:] = jnp.where(use, c0, lam_pp[:])
            lam_p[:] = jnp.where(use, c1, lam_p[:])
            kcnt[:] = jnp.where(use, jnp.zeros_like(kcnt[:]), kcnt[:])

    # blocks entirely before this tile's first seed (l < m0 for every m)
    # are identically zero — skip the sweep and the dots
    @pl.when(l0 + lb > m0)
    def _work():
        z = z_ref[0, :][None, :]                      # [1, RT]
        m_ids = m0 + jax.lax.broadcasted_iota(
            jnp.int32, (mt, 1), 0
        )                                              # [MT, 1]
        thresh = jnp.float32(2.0**_SCALE_BETA)
        down = jnp.float32(2.0**-_SCALE_S)

        def pair(le, _):
            l_even = l0 + 2 * le
            ab = rec_ab_ref[:, pl.ds(2 * le, 2), :]    # [2, 2, MT]

            def one_row(l_row, a_row, b_row, lp, lpp, k):
                lam = a_row[:, None] * (z * lp) + b_row[:, None] * lpp
                at_seed = m_ids == l_row
                lam = jnp.where(at_seed, seed_ref[:], lam)
                k = jnp.where(at_seed, k0_ref[:], k)
                out = jnp.where(k == 0.0, lam, 0.0)
                return lam, lp, k, out

            lp, lpp, k = lam_p[:], lam_pp[:], kcnt[:]
            lp, lpp, k, out_e = one_row(l_even, ab[0, 0], ab[1, 0],
                                        lp, lpp, k)
            lp, lpp, k, out_o = one_row(l_even + 1, ab[0, 1], ab[1, 1],
                                        lp, lpp, k)
            # rescale once per row pair (all-VMEM, amortised semantics)
            grow = (jnp.abs(lp) > thresh) & (k > 0.0)
            lam_p[:] = jnp.where(grow, lp * down, lp)
            lam_pp[:] = jnp.where(grow, lpp * down, lpp)
            kcnt[:] = jnp.where(grow, k - 1.0, k)
            scr0[pl.ds(le, 1)] = out_e[None]
            scr1[pl.ds(le, 1)] = out_o[None]
            return 0

        jax.lax.fori_loop(0, lbe, pair, 0)

        # batch-leading MXU dots: [MT, F2, LBe] · [MT, LBe, RT]
        lam0 = jnp.transpose(scr0[:], (1, 0, 2))       # [MT, LBe, RT]
        lam1 = jnp.transpose(scr1[:], (1, 0, 2))
        dn = (((2,), (1,)), ((0,), (0,)))
        x0 = jax.lax.dot_general(
            jnp.transpose(alm0_ref[:], (2, 0, 1)), lam0,
            dimension_numbers=dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                              # [MT, F2, RT]
        x1 = jax.lax.dot_general(
            jnp.transpose(alm1_ref[:], (2, 0, 1)), lam1,
            dimension_numbers=dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        he_ref[:] += jnp.transpose(x0, (1, 2, 0))      # [F2, RT, MT]
        ho_ref[:] += jnp.transpose(x1, (1, 2, 0))


@functools.partial(
    jax.jit,
    static_argnames=("lb", "mt", "rt", "band_blocks", "interpret"),
)
def scan_contract_fused(rec_a, rec_b, lam_mm_T, k0_T, z, ck_T,
                        alm0_m, alm1_m, *, lb=128, mt=128, rt=128,
                        band_blocks=2, interpret=False):
    """Fused scan-Legendre contraction.

    Parameters
    ----------
    rec_a, rec_b : [L, M] recurrence coefficient rows (sht tables).
    lam_mm_T, k0_T : [M, R] transposed seed tables.
    z : [R] cosθ (northern half-rings).
    ck_T : [nband, 2, M, R] transposed checkpoint rows (zeros disable).
    alm0_m, alm1_m : [F2, L//2, M] even/odd-ℓ a_lm planes (m minor —
        the small plane axis must never be a lane dimension: Mosaic
        lane-pads minor axes to 128, which cost 16× HBM at nside=2048).

    Returns
    -------
    (He, Ho) : [F2, R, M] float32 — even/odd-ℓ accumulators, ready for
    the parity → N/S routing without a relayout.
    """
    L, M = rec_a.shape
    R = z.shape[0]
    F2 = alm0_m.shape[0]
    if L % lb or M % mt or R % rt or lb % 2:
        raise ValueError("shape/tile mismatch")
    n_l = L // lb

    rec_ab = jnp.stack([rec_a, rec_b])                 # [2, L, M]
    z2 = z.reshape(1, R)
    lbe = lb // 2
    # a [1, 2, M, R] zeros ck table means "no checkpoints": swap in a
    # single-block dummy so 10 GB of structural zeros never reach HBM
    # (the nside=2048 OOM attribution, tools/scan_2048_noring.out)
    use_ck = ck_T.shape[0] > 1
    if not use_ck:
        ck_T = jnp.zeros((1, 2, mt, rt), jnp.float32)

    grid = (M // mt, R // rt, n_l)

    out = pl.pallas_call(
        functools.partial(
            _kernel, lb=lb, band_blocks=band_blocks, n_l=n_l,
            use_ck=use_ck,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, lb, mt), lambda m, r, l: (0, l, m)),
            pl.BlockSpec((mt, rt), lambda m, r, l: (m, r)),
            pl.BlockSpec((mt, rt), lambda m, r, l: (m, r)),
            pl.BlockSpec((1, rt), lambda m, r, l: (0, r)),
            pl.BlockSpec(
                (1, 2, mt, rt),
                (lambda m, r, l, bb=band_blocks: (l // bb, 0, m, r))
                if use_ck else (lambda m, r, l: (0, 0, 0, 0)),
            ),
            pl.BlockSpec((F2, lbe, mt), lambda m, r, l: (0, l, m)),
            pl.BlockSpec((F2, lbe, mt), lambda m, r, l: (0, l, m)),
        ],
        out_specs=[
            pl.BlockSpec((F2, rt, mt), lambda m, r, l: (0, r, m)),
            pl.BlockSpec((F2, rt, mt), lambda m, r, l: (0, r, m)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F2, R, M), jnp.float32),
            jax.ShapeDtypeStruct((F2, R, M), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((mt, rt), jnp.float32),
            pltpu.VMEM((mt, rt), jnp.float32),
            pltpu.VMEM((mt, rt), jnp.float32),
            pltpu.VMEM((lbe, mt, rt), jnp.float32),
            pltpu.VMEM((lbe, mt, rt), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * F2 * L * R * M // 2,
            bytes_accessed=4 * (M * L * F2 + 2 * M * R * F2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rec_ab, lam_mm_T, k0_T, z2, ck_T, alm0_m, alm1_m)
    return out


def fused_GeGo(op, t, alm, interpret=False, mt=128, rt=128, lb=128):
    """Ge/Go ring spectra from a batched alm via the fused kernel.

    alm: [..., L, M] complex (batch flattened into the F2 plane axis).
    Returns (Ge, Go) [..., nh, M] complex64 like
    sht._legendre_contract_scan_streamed(expand=False) after plane join.
    """
    L = op.lmax + 1
    nh = int(np.asarray(t["z_half"]).shape[0])

    batch = alm.shape[:-2]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    a = alm.reshape(B, L, L)
    planes = jnp.concatenate([a.real, a.imag], axis=0).astype(jnp.float32)
    F2 = 2 * B

    # pad every axis to its tile multiple
    def pad_to(x, mult, axis):
        n = x.shape[axis]
        p = (-n) % mult
        if p == 0:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, p)
        return jnp.pad(x, pads)

    Lp = L + ((-L) % lb)
    Mp = L + ((-L) % mt)
    Rp = nh + ((-nh) % rt)

    rec_a = pad_to(pad_to(t["rec_a"], lb, 0), mt, 1)
    rec_b = pad_to(pad_to(t["rec_b"], lb, 0), mt, 1)
    lam_mm_T = pad_to(pad_to(t["lam_mm"].T, mt, 0), rt, 1)
    k0_T = pad_to(pad_to(t["lam_k0"].T, mt, 0), rt, 1)
    # pad k0 with k=1 so padded lanes never emit
    if Mp > L or Rp > nh:
        mask = jnp.zeros((Mp, Rp), bool).at[:L, :nh].set(True)
        k0_T = jnp.where(mask, k0_T, 1.0)
    z = pad_to(t["z_half"].astype(jnp.float32), rt, 0)

    ck = t.get("lam_ck")
    n_l = Lp // lb
    if ck is not None:
        bb = max(1, (op.l_chunk * op.ckpt_every) // lb)
        nband_k = -(-n_l // bb)
        ckT = jnp.transpose(ck.astype(jnp.float32), (0, 1, 3, 2))
        ckT = pad_to(pad_to(ckT, mt, 2), rt, 3)
        have = ckT.shape[0]
        if have < nband_k:
            ckT = jnp.pad(ckT, ((0, nband_k - have), (0, 0), (0, 0), (0, 0)))
        ckT = ckT[:nband_k]
    else:
        bb = n_l  # single band: the override never fires after block 0
        ckT = jnp.zeros((1, 2, Mp, Rp), jnp.float32)

    am = pad_to(pad_to(planes, lb, 1), mt, 2)          # [F2, Lp, Mp]
    alm0_m = am[:, 0::2, :]
    alm1_m = am[:, 1::2, :]

    He, Ho = scan_contract_fused(
        rec_a.astype(jnp.float32), rec_b.astype(jnp.float32),
        lam_mm_T.astype(jnp.float32), k0_T.astype(jnp.float32),
        z, ckT, alm0_m, alm1_m,
        lb=lb, mt=mt, rt=rt, band_blocks=bb, interpret=interpret,
    )
    # [F2, R, M] complex planes → parity → m routing (no relayout)
    H0 = He[:, :nh, :L]
    H1 = Ho[:, :nh, :L]
    H0c = (H0[:B] + 1j * H0[B:]).reshape(batch + (nh, L))
    H1c = (H1[:B] + 1j * H1[B:]).reshape(batch + (nh, L))
    meven = (jnp.arange(L)[None, :] % 2 == 0).astype(jnp.float32)
    Ge = H0c * meven + H1c * (1.0 - meven)
    Go = H0c * (1.0 - meven) + H1c * meven
    return Ge, Go


def _adj_kernel(rec_ab_ref, seed_ref, k0_ref, z_ref, ck_ref,
                src0_ref, src1_ref, alm0_ref, alm1_ref,
                lam_p_all, lam_pp_all, k_all, scr0, scr1,
                *, lb, band_blocks, n_l, use_ck):
    """Adjoint grid step (i_m, i_l, i_r — r innermost).

    The projection alm[l, m] = Σ_r λ_l[r, m]·src[r, m] accumulates the
    (l, m) output block across ring tiles, so r must be the innermost
    grid dimension; the recurrence carry is per ring-tile and lives in
    slot i_r of the [NR, MT, RT] scratch arrays.
    src0/src1: the even/odd-ℓ source mixes (Ge·meven + Go·modd and its
    complement — reference semantics: sht._legendre_project_scan's
    (l+m)-parity masks collapsed per ℓ-row parity).
    """
    i_m = pl.program_id(0)
    i_l = pl.program_id(1)
    i_r = pl.program_id(2)
    mt = seed_ref.shape[0]
    lbe = lb // 2

    l0 = i_l * lb
    m0 = i_m * mt

    @pl.when(i_l == 0)
    def _init_carry():
        lam_p_all[pl.ds(i_r, 1)] = jnp.zeros_like(lam_p_all[pl.ds(i_r, 1)])
        lam_pp_all[pl.ds(i_r, 1)] = jnp.zeros_like(
            lam_pp_all[pl.ds(i_r, 1)]
        )
        k_all[pl.ds(i_r, 1)] = jnp.zeros_like(k_all[pl.ds(i_r, 1)])

    @pl.when(i_r == 0)
    def _init_out():
        alm0_ref[:] = jnp.zeros_like(alm0_ref)
        alm1_ref[:] = jnp.zeros_like(alm1_ref)

    if use_ck:
        @pl.when((i_l % band_blocks == 0) & (i_l > 0))
        def _ck():
            c0 = ck_ref[0, 0]
            c1 = ck_ref[0, 1]
            use = (jnp.abs(c0) > _CK_USE_TH) & (jnp.abs(c1) > _CK_USE_TH)
            lam_pp_all[pl.ds(i_r, 1)] = jnp.where(
                use, c0, lam_pp_all[i_r]
            )[None]
            lam_p_all[pl.ds(i_r, 1)] = jnp.where(
                use, c1, lam_p_all[i_r]
            )[None]
            k_all[pl.ds(i_r, 1)] = jnp.where(
                use, jnp.zeros_like(k_all[i_r]), k_all[i_r]
            )[None]

    @pl.when(l0 + lb > m0)
    def _work():
        z = z_ref[0, :][None, :]
        m_ids = m0 + jax.lax.broadcasted_iota(jnp.int32, (mt, 1), 0)
        thresh = jnp.float32(2.0**_SCALE_BETA)
        down = jnp.float32(2.0**-_SCALE_S)

        def pair(le, c):
            lp, lpp, k = c
            l_even = l0 + 2 * le
            ab = rec_ab_ref[:, pl.ds(2 * le, 2), :]

            def one_row(l_row, a_row, b_row, lp, lpp, k):
                lam = a_row[:, None] * (z * lp) + b_row[:, None] * lpp
                at_seed = m_ids == l_row
                lam = jnp.where(at_seed, seed_ref[:], lam)
                k = jnp.where(at_seed, k0_ref[:], k)
                out = jnp.where(k == 0.0, lam, 0.0)
                return lam, lp, k, out

            lp, lpp, k, out_e = one_row(l_even, ab[0, 0], ab[1, 0],
                                        lp, lpp, k)
            lp, lpp, k, out_o = one_row(l_even + 1, ab[0, 1], ab[1, 1],
                                        lp, lpp, k)
            grow = (jnp.abs(lp) > thresh) & (k > 0.0)
            lp = jnp.where(grow, lp * down, lp)
            lpp = jnp.where(grow, lpp * down, lpp)
            k = jnp.where(grow, k - 1.0, k)
            scr0[pl.ds(le, 1)] = out_e[None]
            scr1[pl.ds(le, 1)] = out_o[None]
            return (lp, lpp, k)

        lp, lpp, k = jax.lax.fori_loop(
            0, lbe, pair,
            (lam_p_all[i_r], lam_pp_all[i_r], k_all[i_r]),
        )
        lam_p_all[pl.ds(i_r, 1)] = lp[None]
        lam_pp_all[pl.ds(i_r, 1)] = lpp[None]
        k_all[pl.ds(i_r, 1)] = k[None]

        # [MT, LBe, RT] λ · [MT, RT, F2] src → [MT, LBe, F2]
        lam0 = jnp.transpose(scr0[:], (1, 0, 2))
        lam1 = jnp.transpose(scr1[:], (1, 0, 2))
        dn = (((2,), (1,)), ((0,), (0,)))
        y0 = jax.lax.dot_general(
            lam0, jnp.transpose(src0_ref[:], (2, 1, 0)),
            dimension_numbers=dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        y1 = jax.lax.dot_general(
            lam1, jnp.transpose(src1_ref[:], (2, 1, 0)),
            dimension_numbers=dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        alm0_ref[:] += jnp.transpose(y0, (2, 1, 0))    # [F2, LBe, MT]
        alm1_ref[:] += jnp.transpose(y1, (2, 1, 0))


@functools.partial(
    jax.jit,
    static_argnames=("lb", "mt", "rt", "band_blocks", "interpret"),
)
def scan_project_fused(rec_a, rec_b, lam_mm_T, k0_T, z, ck_T,
                       src0, src1, *, lb=128, mt=128, rt=128,
                       band_blocks=2, interpret=False):
    """Fused scan-Legendre PROJECTION (the analysis adjoint).

    src0, src1 : [F2, R, M] even/odd-ℓ source mixes (f32 planes).
    Returns (alm0, alm1) [F2, L//2, M] — the even/odd-ℓ alm rows.
    Other tables as :func:`scan_contract_fused`.
    """
    L, M = rec_a.shape
    R = z.shape[0]
    F2 = src0.shape[0]
    if L % lb or M % mt or R % rt or lb % 2:
        raise ValueError("shape/tile mismatch")
    n_l = L // lb
    n_r = R // rt

    rec_ab = jnp.stack([rec_a, rec_b])
    z2 = z.reshape(1, R)
    lbe = lb // 2
    use_ck = ck_T.shape[0] > 1
    if not use_ck:
        ck_T = jnp.zeros((1, 2, mt, rt), jnp.float32)

    grid = (M // mt, n_l, n_r)

    return pl.pallas_call(
        functools.partial(
            _adj_kernel, lb=lb, band_blocks=band_blocks, n_l=n_l,
            use_ck=use_ck,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, lb, mt), lambda m, l, r: (0, l, m)),
            pl.BlockSpec((mt, rt), lambda m, l, r: (m, r)),
            pl.BlockSpec((mt, rt), lambda m, l, r: (m, r)),
            pl.BlockSpec((1, rt), lambda m, l, r: (0, r)),
            pl.BlockSpec(
                (1, 2, mt, rt),
                (lambda m, l, r, bb=band_blocks: (l // bb, 0, m, r))
                if use_ck else (lambda m, l, r: (0, 0, 0, 0)),
            ),
            pl.BlockSpec((F2, rt, mt), lambda m, l, r: (0, r, m)),
            pl.BlockSpec((F2, rt, mt), lambda m, l, r: (0, r, m)),
        ],
        out_specs=[
            pl.BlockSpec((F2, lbe, mt), lambda m, l, r: (0, l, m)),
            pl.BlockSpec((F2, lbe, mt), lambda m, l, r: (0, l, m)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F2, L // 2, M), jnp.float32),
            jax.ShapeDtypeStruct((F2, L // 2, M), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_r, mt, rt), jnp.float32),
            pltpu.VMEM((n_r, mt, rt), jnp.float32),
            pltpu.VMEM((n_r, mt, rt), jnp.float32),
            pltpu.VMEM((lbe, mt, rt), jnp.float32),
            pltpu.VMEM((lbe, mt, rt), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * F2 * L * R * M // 2,
            bytes_accessed=4 * (2 * M * R * F2 + M * L * F2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rec_ab, lam_mm_T, k0_T, z2, ck_T, src0, src1)


# ---------------------------------------------------------------------------
# Spin-weighted (Wigner-d) fused kernels
#
# The spin engine's recurrence (cora_tpu/healpix/spin.py)
#     d^l = A_l (z − B_l) d^{l−1} + C_l d^{l−2},  seeded at l0 = max(|m|,|s|)
# is the scalar kernel's form with one extra shift coefficient, no
# parity decoupling, and no power-of-two rescaling (seeds below f32 tiny
# truncate to zero, matching the XLA scan semantics).  The emitted rows
# carry the (−1)^m · sqrt((2l+1)/4π) normalisation, computed in-kernel.
# ---------------------------------------------------------------------------


def _wig_kernel(coef_ref, seed_ref, l0_ref, z_ref, alm_ref, g_ref,
                lam_p, lam_pp, scr, *, lb, n_l, adjoint):
    """One (i_m, i_r, i_l) [synthesis] or (i_m, i_l, i_r) [adjoint] step.

    coef_ref: [3, LB, MT]  A/B/C recurrence rows
    seed_ref, l0_ref: [MT, RT]  seed values / seed row indices (per m)
    alm_ref: [F2, LB, MT] (synthesis) — a_lm planes, m minor
             [F2, RT, MT] (adjoint)   — ring-spectrum planes
    g_ref:   [F2, RT, MT] (synthesis) / [F2, LB, MT] (adjoint) — output,
             accumulated across the inner grid dimension
    lam_p/lam_pp: [MT, RT] (synthesis) or [NR, MT, RT] (adjoint slots)
    """
    i_m = pl.program_id(0)
    if adjoint:
        i_l, i_r = pl.program_id(1), pl.program_id(2)
    else:
        i_r, i_l = pl.program_id(1), pl.program_id(2)
    mt = seed_ref.shape[0]

    l0blk = i_l * lb
    m0 = i_m * mt

    @pl.when(i_l == 0)
    def _init_carry():
        if adjoint:
            lam_p[pl.ds(i_r, 1)] = jnp.zeros_like(lam_p[pl.ds(i_r, 1)])
            lam_pp[pl.ds(i_r, 1)] = jnp.zeros_like(lam_pp[pl.ds(i_r, 1)])
        else:
            lam_p[:] = jnp.zeros_like(lam_p)
            lam_pp[:] = jnp.zeros_like(lam_pp)

    first_out = i_r == 0 if adjoint else i_l == 0

    @pl.when(first_out)
    def _init_out():
        g_ref[:] = jnp.zeros_like(g_ref)

    # row l of this block seeds columns with l0 == l; blocks entirely
    # before every column's seed row are identically zero.  l0 >= |m|,
    # so m0 is a lower bound for the tile's seeds.
    @pl.when(l0blk + lb > m0)
    def _work():
        z = z_ref[0, :][None, :]
        inv4pi = jnp.float32(1.0 / (4.0 * np.pi))
        sign_m = 1.0 - 2.0 * jnp.asarray(
            (m0 + jax.lax.broadcasted_iota(jnp.int32, (mt, 1), 0)) % 2,
            jnp.float32,
        )

        def row(le, c):
            lp, lpp = c
            l_row = l0blk + le
            co = coef_ref[:, pl.ds(le, 1), :][:, 0, :]   # [3, MT]
            lam = (
                co[0][:, None] * (z - co[1][:, None]) * lp
                + co[2][:, None] * lpp
            )
            at_seed = l0_ref[:] == l_row
            lam = jnp.where(at_seed, seed_ref[:], lam)
            nrm = jnp.sqrt(
                (2.0 * jnp.asarray(l_row, jnp.float32) + 1.0) * inv4pi
            )
            scr[pl.ds(le, 1)] = (lam * (nrm * sign_m))[None]
            return (lam, lp)

        if adjoint:
            lp, lpp = jax.lax.fori_loop(
                0, lb, row, (lam_p[i_r], lam_pp[i_r])
            )
            lam_p[pl.ds(i_r, 1)] = lp[None]
            lam_pp[pl.ds(i_r, 1)] = lpp[None]
        else:
            lp, lpp = jax.lax.fori_loop(0, lb, row, (lam_p[:], lam_pp[:]))
            lam_p[:] = lp
            lam_pp[:] = lpp

        lam_b = jnp.transpose(scr[:], (1, 0, 2))         # [MT, LB, RT]
        dn = (((2,), (1,)), ((0,), (0,)))
        if adjoint:
            # alm[l, m] += Σ_r λ·G: [MT, LB, RT]·[MT, RT, F2]
            y = jax.lax.dot_general(
                lam_b, jnp.transpose(alm_ref[:], (2, 1, 0)),
                dimension_numbers=dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                            # [MT, LB, F2]
            g_ref[:] += jnp.transpose(y, (2, 1, 0))
        else:
            # G[r, m] += Σ_l a·λ: [MT, F2, LB]·[MT, LB, RT]
            y = jax.lax.dot_general(
                jnp.transpose(alm_ref[:], (2, 0, 1)), lam_b,
                dimension_numbers=dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                            # [MT, F2, RT]
            g_ref[:] += jnp.transpose(y, (1, 2, 0))


@functools.partial(
    jax.jit,
    static_argnames=("lb", "mt", "rt", "adjoint", "interpret"),
)
def wigner_apply_fused(coefs, seed_T, l0_T, z, x, *, lb=128, mt=128,
                       rt=128, adjoint=False, interpret=False):
    """Fused Wigner-d generate-and-contract (spin-weighted SHT stage).

    coefs : [3, L, M]  A/B-shift/C recurrence rows (zero where invalid).
    seed_T, l0_T : [M, R]  seed values / integer seed rows (as f32/i32).
    z : [R] cosθ.
    x : synthesis [F2, L, M] a_lm planes → returns G [F2, R, M];
        adjoint   [F2, R, M] ring planes → returns alm [F2, L, M].
    The (−1)^m sqrt((2l+1)/4π) normalisation is applied in-kernel.
    """
    _, L, M = coefs.shape
    R = z.shape[0]
    F2 = x.shape[0]
    if L % lb or M % mt or R % rt:
        raise ValueError("shape/tile mismatch")
    n_l = L // lb
    n_r = R // rt
    z2 = z.reshape(1, R)

    if adjoint:
        grid = (M // mt, n_l, n_r)
        x_spec = pl.BlockSpec((F2, rt, mt), lambda m, l, r: (0, r, m))
        out_spec = pl.BlockSpec((F2, lb, mt), lambda m, l, r: (0, l, m))
        out_shape = jax.ShapeDtypeStruct((F2, L, M), jnp.float32)
        coef_spec = pl.BlockSpec((3, lb, mt), lambda m, l, r: (0, l, m))
        mr_spec = pl.BlockSpec((mt, rt), lambda m, l, r: (m, r))
        z_spec = pl.BlockSpec((1, rt), lambda m, l, r: (0, r))
        carry_shape = (n_r, mt, rt)
    else:
        grid = (M // mt, n_r, n_l)
        x_spec = pl.BlockSpec((F2, lb, mt), lambda m, r, l: (0, l, m))
        out_spec = pl.BlockSpec((F2, rt, mt), lambda m, r, l: (0, r, m))
        out_shape = jax.ShapeDtypeStruct((F2, R, M), jnp.float32)
        coef_spec = pl.BlockSpec((3, lb, mt), lambda m, r, l: (0, l, m))
        mr_spec = pl.BlockSpec((mt, rt), lambda m, r, l: (m, r))
        z_spec = pl.BlockSpec((1, rt), lambda m, r, l: (0, r))
        carry_shape = (mt, rt)

    return pl.pallas_call(
        functools.partial(_wig_kernel, lb=lb, n_l=n_l, adjoint=adjoint),
        grid=grid,
        in_specs=[coef_spec, mr_spec, mr_spec, z_spec, x_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM(carry_shape, jnp.float32),
            pltpu.VMEM(carry_shape, jnp.float32),
            pltpu.VMEM((lb, mt, rt), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * F2 * L * R * M // 2,
            bytes_accessed=4 * (M * L * F2 + M * R * F2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(coefs, seed_T, l0_T.astype(jnp.int32), z2, x)
