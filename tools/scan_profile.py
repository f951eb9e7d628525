"""Stage attribution for the Λ-free checkpointed-scan synthesis step.

The scan mode (legendre_mode="scan", the per-device stage of the
Nside ≥ 1024 configs where the cached Λ table exceeds HBM) has had no
dedicated profiling round; this tool splits its step by cumulative-
program subtraction, like tools/ring_profile.py does for the cached
path:

  lamleg — λ recurrence bands + parity einsums against CONSTANT alm
           blocks (no RNG draw, no root contraction)
  noring — the production draw (ξ RNG + root contraction) + λ + einsums
  full   — the complete step (+ parity ring synthesis)

Subtraction: draw ≈ noring − lamleg, ring ≈ full − noring; XLA overlap
makes each conservative.  Within ONE process only (cross-process
variance on this box is ±20%).

Usage: python tools/scan_profile.py [--nside 1024] [--nfreq 64]
         [--fleg 64] [--fchunk 4] [--lchunk 128] [--ckevery 2]
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
    p.add_argument("--nside", type=int, default=1024)
    p.add_argument("--nfreq", type=int, default=64)
    p.add_argument("--fchunk", type=int, default=4)
    p.add_argument("--fleg", type=int, default=64)
    p.add_argument("--lchunk", type=int, default=128)
    p.add_argument("--ckevery", type=int, default=2)
    p.add_argument("--capsub", type=int, default=None)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--prec", default="highest")
    p.add_argument("--cmul", default="xla", choices=["xla", "karatsuba"])
    p.add_argument("--convmode", default=None,
                   choices=[None, "fused", "twostep"])
    p.add_argument("--modes", default="lamleg,noring,full")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cora_tpu.healpix import sht as S
    from cora_tpu.healpix.sht import SHT
    from cora_tpu.util import xfer

    nside, nfreq = args.nside, args.nfreq
    lmax = 3 * nside - 1
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((lmax + 1, nfreq, nfreq)).astype(np.float32)
    roots = np.tril(a) * 1e-3

    t0 = time.time()
    ke = args.ckevery
    op = SHT(nside, lmax, legendre_mode="scan", fft_mode="mm",
             l_chunk=args.lchunk, cap_sub=args.capsub, precision=args.prec,
             fft_cmul=args.cmul, conv_mode=args.convmode, scan_ckpt=True,
             ckpt_every=ke,
             ckpt_cache=os.path.join(
                 cache_dir, f"ck_{nside}_{lmax}_{args.lchunk}_{ke}.npz"))
    t = xfer.put_tree(op.tables(False))
    roots_d = xfer.put(roots)
    print(f"# SHT setup: {time.time()-t0:.1f}s", file=sys.stderr)

    fleg, fchunk = args.fleg, args.fchunk

    def make_step(mode):
        def _one(key, r, tt):
            from jax import lax

            nz = r.shape[-1]
            # scan mode consumes CONSECUTIVE-ℓ roots (no parity packing —
            # synthesis_scan_correlated does the same for "lam" not in t)
            roots_p = r

            def leg_body(i, carry):
                z0 = i * fleg
                if mode == "lamleg":
                    # constant alm blocks: λ bands + einsums, no draw
                    def alm_blk(c, l0, nrows, mw):
                        return jnp.full(
                            (fleg, 2, nrows, mw), 1e-6, jnp.float32
                        )

                    Ge, Go = S._legendre_contract_scan_streamed(
                        op, tt, alm_blk, (fleg, 2), jnp.float32,
                        expand=False,
                    )
                    Ge, Go = S._join_planes(Ge), S._join_planes(Go)
                else:
                    Ge, Go = S._correlated_GeGo_scan(
                        op, tt, roots_p, key, z0, fleg)
                if mode != "full":
                    return carry + jnp.sum(jnp.abs(Ge)) + jnp.sum(
                        jnp.abs(Go))

                def ring_body(j, c2):
                    ge = lax.dynamic_slice_in_dim(Ge, j * fchunk, fchunk, 0)
                    go = lax.dynamic_slice_in_dim(Go, j * fchunk, fchunk, 0)
                    g = S._rings_to_grid_parity(op, tt, ge, go)
                    return c2 + jnp.sum(jnp.abs(g))

                return lax.fori_loop(0, fleg // fchunk, ring_body, carry)

            return lax.fori_loop(0, nz // fleg, leg_body, jnp.float32(0.0))

        from jax import lax  # noqa: F401  (closure import above)
        return jax.jit(_one)

    results = {}
    for mode in args.modes.split(","):
        fn = make_step(mode)
        key = jax.random.key(0, impl="rbg")
        t0 = time.time()
        s = float(fn(key, roots_d, t))
        warm = time.time() - t0
        times = []
        for i in range(args.reps):
            k = jax.random.key(i + 1, impl="rbg")
            t0 = time.time()
            float(fn(k, roots_d, t))
            times.append(time.time() - t0)
        best = min(times)
        results[mode] = best
        print(f"# {mode:7s}: {best:.4f}s (warm {warm:.1f}s, sum {s:.3e})",
              file=sys.stderr)
        import gc

        del fn
        jax.clear_caches()
        gc.collect()

    if "lamleg" in results and "noring" in results:
        print(f"# draw  (noring - lamleg): "
              f"{results['noring'] - results['lamleg']:+.4f}s",
              file=sys.stderr)
    if "full" in results and "noring" in results:
        print(f"# ring  (full - noring):   "
              f"{results['full'] - results['noring']:+.4f}s",
              file=sys.stderr)
    # minimum-HBM roofline terms for the scan Legendre stage: the λ
    # chunk volume is written by the recurrence scan and read back by
    # the einsum — 2 passes over the full triangle per sweep
    nh, L = 2 * nside, lmax + 1
    lam_entries = nh * (L * (L + 1) // 2)
    lam_gb = lam_entries * 4 / 1e9
    nsweep = max(1, nfreq // fleg)
    print(f"# λ triangle: {lam_gb:.1f} GB f32; write+read per sweep = "
          f"{2*lam_gb:.1f} GB × {nsweep} sweep(s)", file=sys.stderr)
    if "full" in results:
        gbs = 2 * lam_gb * nsweep / results["full"]
        print(f"# λ-traffic-only bandwidth at full-step time: "
              f"{gbs:.0f} GB/s vs 819 peak", file=sys.stderr)
    print(json.dumps({"nside": nside, "nfreq": nfreq, "fleg": fleg,
                      "fchunk": fchunk, "lchunk": args.lchunk,
                      "ckevery": args.ckevery, **results}))


if __name__ == "__main__":
    main()
