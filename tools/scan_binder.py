"""Binder isolation for the scan-mode Legendre stage (VERDICT r4 item 1).

tools/scan_profile.py showed the λ stage is ~1.9 s of the 2.39 s
nside=1024 step while running at ~4% of HBM peak on its own traffic and
~1% of MXU peak — neither classic roofline binds, and the 8-row unroll
(carry-traffic hypothesis) measured −2%.  This tool times stripped-down
variants of the SAME band/scan structure to attribute the cost:

  base       full production recurrence + parity einsums (lamleg twin)
  norescale  recurrence without seed/rescale selects (wrong numerics —
             timing only): isolates the cost of the 6 jnp.where lanes
  noeinsum   recurrence + λ-chunk reduction (no MXU contraction):
             isolates the einsum cost by subtraction
  noemit     recurrence only, consume final carry (no per-row stack):
             isolates the λ emission/stacking cost
  nocarryio  einsums against a CONSTANT λ chunk (no recurrence at all):
             lower bound for the contraction stage alone
  mwfull     base but with mw pinned to L for every band (tests whether
             the growing ragged mw forces relayouts)

plus an unroll sweep (--rows N overrides the R in _lam_scan_rows).

Within ONE process only (cross-process variance on this box is ±20%).
Usage: python tools/scan_binder.py [--nside 512] [--nfreq 64]
         [--modes base,norescale,...] [--rows 8] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nside", type=int, default=512)
    p.add_argument("--nfreq", type=int, default=64)
    p.add_argument("--fleg", type=int, default=64)
    p.add_argument("--lchunk", type=int, default=128)
    p.add_argument("--ckevery", type=int, default=2)
    p.add_argument("--rows", type=int, default=0,
                   help="override the unroll R (0 = production choice)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--prec", default="highest")
    p.add_argument("--modes",
                   default="base,norescale,noeinsum,noemit,nocarryio")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cora_tpu.healpix import sht as S
    from cora_tpu.healpix.sht import SHT
    from cora_tpu.util import xfer

    nside = args.nside
    lmax = 3 * nside - 1
    L = lmax + 1
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    ke = args.ckevery
    t0 = time.time()
    op = SHT(nside, lmax, legendre_mode="scan", fft_mode="mm",
             l_chunk=args.lchunk, precision=args.prec, scan_ckpt=True,
             ckpt_every=ke,
             ckpt_cache=os.path.join(
                 cache_dir, f"ck_{nside}_{lmax}_{args.lchunk}_{ke}.npz"))
    t = xfer.put_tree(op.tables(False))
    print(f"# SHT setup: {time.time()-t0:.1f}s", file=sys.stderr)

    nh = int(t["z_half"].shape[0])
    lc = op.l_chunk
    nchunk = -(-L // lc)
    g = op.ckpt_every
    nband = -(-nchunk // g)
    fleg = args.fleg
    m_arr_np = np.arange(L)

    def make_fn(mode, R):
        if mode == "pallas":
            # fused recurrence+contraction kernel (ops/pallas_scan_legendre)
            # with constant alm planes — the lamleg-equivalent measurement
            from cora_tpu.ops import pallas_scan_legendre as psl

            Mp = L + ((-L) % 128)
            Rp = nh + ((-nh) % 128)
            rec_a = np.zeros((Mp, Mp), np.float32)
            rec_b = np.zeros((Mp, Mp), np.float32)
            rec_a[:L, :L] = np.asarray(t["rec_a"])
            rec_b[:L, :L] = np.asarray(t["rec_b"])
            lam_mm_T = np.zeros((Mp, Rp), np.float32)
            lam_mm_T[:L, :nh] = np.asarray(t["lam_mm"]).T
            k0_T = np.ones((Mp, Rp), np.float32)
            k0_T[:L, :nh] = np.asarray(t["lam_k0"]).T
            zp = np.zeros((Rp,), np.float32)
            zp[:nh] = np.asarray(t["z_half"])
            bb = max(1, (op.l_chunk * op.ckpt_every) // 128)
            n_l = Mp // 128
            nband_k = -(-n_l // bb)
            ck = np.asarray(t["lam_ck"])
            ckT = np.zeros((nband_k, 2, Mp, Rp), np.float32)
            nb = min(nband_k, ck.shape[0])
            ckT[:nb, :, :L, :nh] = np.transpose(ck[:nb], (0, 1, 3, 2))
            F2 = fleg * 2
            alm0 = jnp.full((F2, Mp // 2, Mp), 1e-6, jnp.float32)
            alm1 = jnp.full((F2, Mp // 2, Mp), 1e-6, jnp.float32)
            args = [xfer.put(a) for a in
                    (rec_a, rec_b, lam_mm_T, k0_T, zp, ckT)]

            def _run_pallas(tt):
                He, Ho = psl.scan_contract_fused(
                    *args, alm0, alm1, lb=128, mt=128, rt=128,
                    band_blocks=bb)
                return jnp.sum(jnp.abs(He)) + jnp.sum(jnp.abs(Ho))

            return jax.jit(_run_pallas)

        if mode == "prod":
            # the real production streamed contraction (constant alm blocks,
            # like scan_profile.py's lamleg) — picks up whatever
            # _lam_scan_rows/_scaled_lam_step currently do
            def _run_prod(tt):
                def alm_blk(c, l0, nrows, mw):
                    return jnp.full((fleg, 2, nrows, mw), 1e-6, jnp.float32)

                Ge, Go = S._legendre_contract_scan_streamed(
                    op, tt, alm_blk, (fleg, 2), jnp.float32, expand=False
                )
                return jnp.sum(jnp.abs(Ge)) + jnp.sum(jnp.abs(Go))

            return jax.jit(_run_prod)

        def _run(tt):
            m_arr = jnp.arange(L)
            z = tt["z_half"]
            fdt = tt["lam_mm"].dtype
            ck_c = tt.get("lam_ck")

            H0 = jnp.zeros((fleg, 2, nh, L), dtype=jnp.float32)
            H1 = jnp.zeros_like(H0)
            Hm0 = jnp.zeros((L, fleg * 2, nh), dtype=jnp.float32)
            Hm1 = jnp.zeros_like(Hm0)
            acc = jnp.zeros((nh, L), dtype=fdt)
            lam_p = jnp.zeros((nh, L), dtype=fdt)
            lam_pp = jnp.zeros_like(lam_p)
            k = jnp.zeros_like(lam_p)

            for b in range(nband):
                c_lo = b * g
                nc = min(g, nchunk - c_lo)
                l_lo = c_lo * lc
                if mode == "mwfull":
                    mw = L
                else:
                    mw = min(L, ((min(L, (c_lo + nc) * lc) + 127) // 128)
                             * 128)
                if ck_c is not None:
                    lam_p, lam_pp, k = S._ck_override(
                        ck_c[b], lam_p, lam_pp, k)

                if mode == "norescale":
                    def l_step(c, ys, _mw=mw):
                        lp, lpp, kk, l = c
                        a_l, b_l = ys
                        lam = (a_l[None, :] * z[:, None] * lp
                               + b_l[None, :] * lpp)
                        return (lam, lp, kk, l + 1), lam[:, :_mw]
                else:
                    l_step = S._scaled_lam_step(
                        tt["lam_mm"], tt["lam_k0"], z, m_arr, out_mw=mw)

                nr = min(L - l_lo, nc * lc)
                aa = jax.lax.dynamic_slice_in_dim(
                    tt["rec_a"], l_lo, nr, axis=0)
                bb = jax.lax.dynamic_slice_in_dim(
                    tt["rec_b"], l_lo, nr, axis=0)
                if nr < nc * lc:
                    pad = [(0, nc * lc - nr), (0, 0)]
                    aa = jnp.pad(aa, pad)
                    bb = jnp.pad(bb, pad)
                aa = aa.reshape(nc, lc, L)
                bb = bb.reshape(nc, lc, L)

                alm_blk = jnp.full((fleg, 2, lc, mw), 1e-6, jnp.float32)
                lam_const = jnp.full((lc, nh, mw), 1e-6, jnp.float32)

                if mode == "noemit":
                    # recurrence only: no per-row outputs at all
                    def row_step(c, ys):
                        c2, _ = l_step(c, ys)
                        return c2, None

                    def band_step(carry, xs):
                        lam_p, lam_pp, k, c = carry
                        aa_c, bb_c = xs
                        (lam_p, lam_pp, k, _), _ = jax.lax.scan(
                            row_step, (lam_p, lam_pp, k, c * lc),
                            (aa_c, bb_c))
                        return (lam_p, lam_pp, k, c + 1), None

                    (lam_p, lam_pp, k, _), _ = jax.lax.scan(
                        band_step, (lam_p, lam_pp, k, jnp.asarray(c_lo)),
                        (aa, bb))
                    acc = acc + lam_p
                    (acc, lam_p, lam_pp, k) = jax.lax.optimization_barrier(
                        (acc, lam_p, lam_pp, k))
                    continue

                def scan_rows(l_step_, carry, aa_c, bb_c):
                    if R <= 1:
                        return jax.lax.scan(l_step_, carry, (aa_c, bb_c))
                    if lc % R:
                        raise SystemExit(f"--rows {R} must divide {lc}")

                    def blk(c, ys):
                        ar, br = ys
                        outs = []
                        for i in range(R):
                            c, o = l_step_(c, (ar[i], br[i]))
                            outs.append(o)
                        return c, jnp.stack(outs)

                    carry, lam = jax.lax.scan(
                        blk, carry,
                        (aa_c.reshape((lc // R, R) + aa_c.shape[1:]),
                         bb_c.reshape((lc // R, R) + bb_c.shape[1:])))
                    return carry, lam.reshape((lc,) + lam.shape[2:])

                prec = ("high" if mode.endswith("high") else op.precision)

                if mode == "mmajor":
                    # m-leading Legendre stage: one explicit λ relayout per
                    # band into [mw, l, nh] (the batch-leading layout the
                    # TPU matmul wants — the cached path pre-packs Λ
                    # m-major for exactly this reason and reaches 63% of
                    # HBM peak), band accumulators [mw, f, 2, nh], final
                    # transpose once outside the band loop
                    def band_rec(carry, xs):
                        lam_p, lam_pp, k, c = carry
                        aa_c, bb_c = xs
                        (lam_p, lam_pp, k, _), lam_chunk = scan_rows(
                            l_step, (lam_p, lam_pp, k, c * lc), aa_c, bb_c)
                        return (lam_p, lam_pp, k, c + 1), lam_chunk

                    (lam_p, lam_pp, k, _), lam_band = jax.lax.scan(
                        band_rec, (lam_p, lam_pp, k, jnp.asarray(c_lo)),
                        (aa, bb))
                    lam_m = jnp.transpose(
                        lam_band.reshape(nc * lc, nh, mw), (2, 0, 1)
                    ).astype(jnp.float32)  # [mw, l, nh]
                    alm_m = jnp.full(
                        (mw, nc * lc, fleg * 2), 1e-6, jnp.float32)
                    X0 = jnp.einsum("mlr,mlf->mfr", lam_m[:, 0::2],
                                    alm_m[:, 0::2], precision=prec)
                    X1 = jnp.einsum("mlr,mlf->mfr", lam_m[:, 1::2],
                                    alm_m[:, 1::2], precision=prec)
                    # m-leading full accumulators live in acc-like bufs:
                    # reuse H0/H1 transposed views via at[] on axis 0
                    Hm0 = Hm0.at[:mw].add(X0)
                    Hm1 = Hm1.at[:mw].add(X1)
                    (Hm0, Hm1, lam_p, lam_pp, k) = (
                        jax.lax.optimization_barrier(
                            (Hm0, Hm1, lam_p, lam_pp, k)))
                    continue

                if mode.startswith("bandein"):
                    # one einsum per BAND (K = band rows / 2 per parity)
                    # from the stacked λ of the whole band — tests whether
                    # the per-chunk K=lc/2 batched matmuls are what holds
                    # the einsum stage at ~10% MXU
                    def band_rec(carry, xs):
                        lam_p, lam_pp, k, c = carry
                        aa_c, bb_c = xs
                        (lam_p, lam_pp, k, _), lam_chunk = scan_rows(
                            l_step, (lam_p, lam_pp, k, c * lc), aa_c, bb_c)
                        return (lam_p, lam_pp, k, c + 1), lam_chunk

                    (lam_p, lam_pp, k, _), lam_band = jax.lax.scan(
                        band_rec, (lam_p, lam_pp, k, jnp.asarray(c_lo)),
                        (aa, bb))
                    lam_band = lam_band.reshape(nc * lc, nh, mw).astype(
                        jnp.float32)
                    alm_band = jnp.full(
                        (fleg, 2, nc * lc, mw), 1e-6, jnp.float32)
                    X0 = jnp.einsum("lrm,...lm->...rm", lam_band[0::2],
                                    alm_band[..., 0::2, :], precision=prec)
                    X1 = jnp.einsum("lrm,...lm->...rm", lam_band[1::2],
                                    alm_band[..., 1::2, :], precision=prec)
                    H0 = H0.at[..., :mw].add(X0)
                    H1 = H1.at[..., :mw].add(X1)
                    (H0, H1, acc, lam_p, lam_pp, k) = (
                        jax.lax.optimization_barrier(
                            (H0, H1, acc, lam_p, lam_pp, k)))
                    continue

                def band_step(carry, xs):
                    H0, H1, acc, lam_p, lam_pp, k, c = carry
                    aa_c, bb_c = xs
                    if mode == "nocarryio":
                        lam_c = lam_const
                    else:
                        (lam_p, lam_pp, k, _), lam_chunk = scan_rows(
                            l_step, (lam_p, lam_pp, k, c * lc), aa_c, bb_c)
                        lam_c = lam_chunk.astype(jnp.float32)
                    if mode == "noeinsum":
                        acc = acc.at[:, :mw].add(jnp.sum(lam_c, axis=0))
                    else:
                        X0 = jnp.einsum(
                            "lrm,...lm->...rm", lam_c[0::2],
                            alm_blk[..., 0::2, :], precision=prec)
                        H0 = H0.at[..., :mw].add(X0)
                        X1 = jnp.einsum(
                            "lrm,...lm->...rm", lam_c[1::2],
                            alm_blk[..., 1::2, :], precision=prec)
                        H1 = H1.at[..., :mw].add(X1)
                    return (H0, H1, acc, lam_p, lam_pp, k, c + 1), None

                (H0, H1, acc, lam_p, lam_pp, k, _), _ = jax.lax.scan(
                    band_step,
                    (H0, H1, acc, lam_p, lam_pp, k, jnp.asarray(c_lo)),
                    (aa, bb))
                (H0, H1, acc, lam_p, lam_pp, k) = (
                    jax.lax.optimization_barrier(
                        (H0, H1, acc, lam_p, lam_pp, k)))

            if mode == "mmajor":
                # final relayout to the ring-stage order, once
                G0 = jnp.transpose(Hm0, (1, 2, 0))
                G1 = jnp.transpose(Hm1, (1, 2, 0))
                return jnp.sum(jnp.abs(G0)) + jnp.sum(jnp.abs(G1))
            return (jnp.sum(jnp.abs(H0)) + jnp.sum(jnp.abs(H1))
                    + jnp.sum(jnp.abs(acc)))

        return jax.jit(_run)

    R_prod = next((r for r in (8, 4, 2) if lc % r == 0), 1)
    R = args.rows if args.rows else R_prod
    results = {}
    for mode in args.modes.split(","):
        fn = make_fn(mode, R)
        t0 = time.time()
        s = float(fn(t))
        warm = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            float(fn(t))
            times.append(time.time() - t0)
        best = min(times)
        results[mode] = best
        print(f"# {mode:10s} R={R}: {best:.4f}s (warm {warm:.1f}s, "
              f"sum {s:.3e})", file=sys.stderr)
        import gc

        del fn
        jax.clear_caches()
        gc.collect()

    print(json.dumps({"nside": nside, "nfreq": args.nfreq, "fleg": fleg,
                      "lchunk": lc, "ckevery": g, "rows": R,
                      **{m: round(v, 4) for m, v in results.items()}}))


if __name__ == "__main__":
    main()
