"""Spin-2 (polarised) synthesis bench: fused Wigner kernel vs XLA scan.

The spin engine's scan mode is the production path above nside=256
(the cached spin tables have no parity decoupling and outgrow HBM
earlier than the scalar ones).  This times a full (E, B) → (Q, U)
synthesis at nside=512 both ways in one process.

Usage: python tools/spin_bench.py [--nside 512] [--reps 3] [--cpu]
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
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cora_tpu.healpix.spin import SpinSHT
    from cora_tpu.util import xfer

    nside = args.nside
    lmax = 3 * nside - 1
    L = lmax + 1
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.RandomState(0)
    tri = np.arange(L)[None, :] <= np.arange(L)[:, None]
    almE = xfer.put(((rng.randn(L, L) + 1j * rng.randn(L, L)) * tri
                     ).astype(np.complex64))
    almB = xfer.put(((rng.randn(L, L) + 1j * rng.randn(L, L)) * tri
                     ).astype(np.complex64))

    results = {}
    for mode in ("fused", "xla"):
        t0 = time.time()
        sop = SpinSHT(nside, lmax, 2, l_chunk=64, legendre_mode="scan")
        if mode == "xla":
            sop._use_fused = False
        t = sop.tables(False)
        print(f"# {mode} setup: {time.time()-t0:.1f}s", file=sys.stderr)

        # grid Q/U path, tables as ARGUMENTS (complex tables captured as
        # closure constants need a D2H fetch the tunnelled runtime cannot
        # do — the documented tables() gotcha)
        @jax.jit
        def fn(tt, e, b):
            Q, U = sop._synthesis_grid_impl(tt, e, b)
            return jnp.sum(jnp.abs(Q)), jnp.sum(jnp.abs(U))

        t0 = time.time()
        s = [float(v) for v in fn(t, almE, almB)]
        print(f"# {mode} warm: {time.time()-t0:.1f}s sums={s[0]:.4e},"
              f"{s[1]:.4e}", file=sys.stderr)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            [float(v) for v in fn(t, almE, almB)]
            times.append(time.time() - t0)
        results[mode] = round(min(times), 4)
        print(f"# {mode}: {min(times):.4f}s per (Q,U) synthesis",
              file=sys.stderr)
        del fn, sop, t
        jax.clear_caches()

    print(json.dumps({"nside": nside, **results}))


if __name__ == "__main__":
    main()
