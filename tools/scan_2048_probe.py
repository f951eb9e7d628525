"""Single-chip nside=2048 synthesis probe with the fused Pallas kernel.

Round-3 found every XLA-scan config OOMs at nside=2048 (BASELINE.md
"Deposit at nside=512"… / TODO round 2: step working set > 16 GB HBM;
repeated OOMs can crash the TPU worker).  The fused kernel changes the
budget: no λ workspaces, H is [M, R, F2] (1.6 GB per parity at fleg=8),
and the alm planes scale with the sweep width.  Biggest remaining lumps
are the checkpoint tables (4.8 GB transposed + 4.8 GB untransposed —
the latter skipped here via scan_ckpt=False + kernel-side zeros) and
the ring-stage Bluestein tables.

Usage: python tools/scan_2048_probe.py [--nfreq 8] [--fleg 8]
         [--fchunk 2] [--reps 2]
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
    p.add_argument("--nfreq", type=int, default=8)
    p.add_argument("--fleg", type=int, default=8)
    p.add_argument("--fchunk", type=int, default=2)
    p.add_argument("--lchunk", type=int, default=128)
    p.add_argument("--ckevery", type=int, default=2)
    p.add_argument("--noring", action="store_true",
                   help="Legendre+draw only (skip the ring stage)")
    p.add_argument("--ckpt", action="store_true",
                   help="enable the f64 checkpoint re-seed tables "
                        "(costs ~9.6 GB HBM at this size)")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cora_tpu.healpix import sht as S
    from cora_tpu.healpix.sht import SHT, synthesis_scan_correlated
    from cora_tpu.util import xfer

    nside = 2048
    lmax = 3 * nside - 1
    nfreq = args.nfreq
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.time()
    kw = {}
    if args.ckpt:
        kw = dict(scan_ckpt=True, ckpt_every=args.ckevery,
                  ckpt_cache=os.path.join(
                      cache_dir,
                      f"ck_{nside}_{lmax}_{args.lchunk}_{args.ckevery}.npz"))
    op = SHT(nside, lmax, legendre_mode="scan", fft_mode="mm",
             l_chunk=args.lchunk, precision="highest",
             scan_kernel="pallas", **kw)
    tt = op.tables(False)
    if args.noring:
        # the Legendre-only probe must not pin the (multi-GB at this
        # size) ring-stage Bluestein tables in HBM
        tt = {k: v for k, v in tt.items()
              if k.startswith("psl_") or k == "z_half"}
    t = xfer.put_tree(tt)
    print(f"# SHT setup: {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    a = rng.standard_normal((lmax + 1, nfreq, nfreq)).astype(np.float32)
    roots_d = xfer.put(np.tril(a) * 1e-3)

    fleg, fchunk = args.fleg, args.fchunk

    if args.noring:
        def _one(key, r, tt):
            from jax import lax

            def body(i, acc):
                Ge, Go = S._correlated_GeGo_scan(
                    op, tt, r, key, i * fleg, fleg)
                return acc + jnp.sum(jnp.abs(Ge)) + jnp.sum(jnp.abs(Go))

            return lax.fori_loop(0, nfreq // fleg, body, jnp.float32(0.0))
    else:
        def _one(key, r, tt):
            return synthesis_scan_correlated(
                op, tt, r, key, fleg, fchunk,
                lambda g, z, acc: acc + jnp.sum(jnp.abs(g)),
                jnp.float32(0.0))

    fn = jax.jit(_one)
    key = jax.random.key(0, impl="rbg")
    t0 = time.time()
    s = float(fn(key, roots_d, t))
    print(f"# warm: {time.time()-t0:.1f}s sum={s:.3e}", file=sys.stderr)
    times = []
    for i in range(args.reps):
        k = jax.random.key(i + 1, impl="rbg")
        t0 = time.time()
        float(fn(k, roots_d, t))
        times.append(time.time() - t0)
    best = min(times)
    print(f"# times: {['%.2f' % x for x in times]}", file=sys.stderr)
    print(json.dumps({"nside": nside, "nfreq": nfreq, "fleg": fleg,
                      "fchunk": fchunk, "noring": bool(args.noring),
                      "ckpt": bool(args.ckpt), "step_s": round(best, 3)}))


if __name__ == "__main__":
    main()
