"""Scan-mode Legendre PROJECTION (analysis adjoint) bench: XLA vs the
fused Pallas adjoint kernel (ops/pallas_scan_legendre.scan_project_fused).

Usage: python tools/project_bench.py [--nside 1024] [--nb 4] [--reps 3]
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
    p.add_argument("--nb", type=int, default=4, help="batched maps")
    p.add_argument("--lchunk", type=int, default=128)
    p.add_argument("--ckevery", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cora_tpu.healpix.sht import SHT, _legendre_project_scan
    from cora_tpu.util import xfer

    nside, nb = args.nside, args.nb
    lmax = 3 * nside - 1
    L = lmax + 1
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    results = {}
    for kern in ("pallas", "xla"):
        t0 = time.time()
        op = SHT(nside, lmax, legendre_mode="scan", fft_mode="mm",
                 l_chunk=args.lchunk, scan_ckpt=True,
                 ckpt_every=args.ckevery, scan_kernel=kern,
                 ckpt_cache=os.path.join(
                     cache_dir,
                     f"ck_{nside}_{lmax}_{args.lchunk}_{args.ckevery}.npz"))
        keep = None
        tt = op.tables(False)
        if kern == "pallas":
            # projection-only tables (skip the multi-GB ring tables)
            tt = {k: v for k, v in tt.items()
                  if k.startswith("psl_") or k in
                  ("z_half", "south_idx", "rec_a", "rec_b", "lam_mm",
                   "lam_k0", "lam_ck")}
        else:
            tt = {k: v for k, v in tt.items()
                  if k in ("z_half", "south_idx", "rec_a", "rec_b",
                           "lam_mm", "lam_k0", "lam_ck")}
        t = xfer.put_tree(tt)
        print(f"# {kern} setup: {time.time()-t0:.1f}s", file=sys.stderr)

        rng = np.random.RandomState(0)
        G = xfer.put(
            (rng.randn(nb, op.nring, L)
             + 1j * rng.randn(nb, op.nring, L)).astype(np.complex64)
        )

        fn = jax.jit(
            lambda GG, tt_: jnp.sum(jnp.abs(
                _legendre_project_scan(op, tt_, GG)
            ))
        )
        t0 = time.time()
        s = float(fn(G, t))
        print(f"# {kern} warm: {time.time()-t0:.1f}s sum={s:.4e}",
              file=sys.stderr)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            float(fn(G, t))
            times.append(time.time() - t0)
        results[kern] = round(min(times), 4)
        print(f"# {kern}: {min(times):.4f}s for {nb} maps", file=sys.stderr)
        del fn, G, t
        jax.clear_caches()

    print(json.dumps({"nside": nside, "nb": nb, **results}))


if __name__ == "__main__":
    main()
