"""Ring-stage breakdown of the streamed synthesis step (eq vs cap).

The round-3 roofline (bench.py --roofline) shows the ring stage as the
one flagship stage with headroom (29% of HBM peak / 12 TFLOP/s).  This
tool splits it further by timing cumulative sub-programs of the same
two-level streamed loop (synthesis_scan_correlated):

  noring  — draw + Legendre only (consume Ge/Go)
  expand  — + _expand_rings (N/S parity recombination)
  eq      — + equatorial-band Hermitian-packed IDFT only
  cap     — + banded cap Bluestein only
  full    — the production step (eq + cap + reassembly)

Subtraction gives per-substage time; XLA overlap makes the numbers
conservative (the full step can be faster than the sum of parts).

Usage:  python tools/ring_profile.py [--nside 256] [--nfreq 64]
          [--fchunk 32] [--fleg 64] [--lchunk 64] [--reps 3]

Timing forces a scalar D2H fetch per step (block_until_ready does not
block on the axon backend).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nside", type=int, default=256)
    p.add_argument("--nfreq", type=int, default=64)
    p.add_argument("--fchunk", type=int, default=32)
    p.add_argument("--fleg", type=int, default=64)
    p.add_argument("--lchunk", type=int, default=64)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--capsub", type=int, default=None)
    p.add_argument("--prec", default="highest")
    p.add_argument("--fftprec", default=None,
                   help="fft_precision override (Legendre keeps --prec)")
    p.add_argument("--cmul", default="xla", choices=["xla", "karatsuba"])
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
    roots_path = os.path.join(cache_dir, f"roots_{nside}_{nfreq}.npy")
    if os.path.exists(roots_path):
        roots = np.load(roots_path)
    else:  # synthetic roots: timing is geometry-driven, not value-driven
        rng = np.random.default_rng(0)
        a = rng.standard_normal((lmax + 1, nfreq, nfreq)).astype(np.float32)
        roots = np.tril(a) * 1e-3

    t0 = time.time()
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
             l_chunk=args.lchunk, cap_sub=args.capsub, precision=args.prec,
             fft_cmul=args.cmul, fft_precision=args.fftprec,
             lambda_build="device",
             ckpt_cache=os.path.join(
                 cache_dir, f"ck_{nside}_{args.lchunk}_1.npz"),
             lambda_cache=os.path.join(
                 cache_dir, f"lam_{nside}_{args.lchunk}.npz"))
    t = xfer.put_tree(op.tables(False))
    roots_d = xfer.put(roots)
    print(f"# SHT setup: {time.time()-t0:.1f}s", file=sys.stderr)

    fleg, fchunk = args.fleg, args.fchunk

    def ring_fn(mode):
        def fn(t, ge, go):
            if mode == "noring":
                return jnp.sum(jnp.abs(ge)) + jnp.sum(jnp.abs(go))
            G = S._expand_rings(op, t, ge, go)
            if mode == "expand":
                return jnp.sum(jnp.abs(G))
            cdtype = G.dtype
            lo, hi = op._eq_lo, op._eq_hi
            W = 4 * op.nside
            if mode == "eq":
                A = G[..., lo:hi, :] * t["eq_phase"].astype(cdtype)
                Lp = A.shape[-1]
                if Lp % W:
                    A = jnp.pad(
                        A, [(0, 0)] * (A.ndim - 1) + [(0, W - Lp % W)]
                    )
                A = A.reshape(A.shape[:-1] + (-1, W)).sum(axis=-2)
                feq = S._eq_real_synth(op, t, A, G[..., lo:hi, 0:1].real)
                return jnp.sum(jnp.abs(feq))
            if mode == "cap":
                Gcap = jnp.concatenate(
                    [G[..., :lo, :], G[..., hi:, :]], axis=-2
                )
                cap = (S._cap_real_synth_banded
                       if op._cap_bands is not None else S._cap_real_synth)
                fcap = S._cap_sub_batched(op, cap, t, Gcap)
                return jnp.sum(jnp.abs(fcap))
            g = S._rings_to_grid(op, t, G)
            return jnp.sum(jnp.abs(g))
        return fn

    def make_step(mode):
        rfn = ring_fn(mode)

        def _one(key, r, tt):
            # mirror synthesis_scan_correlated's two-level loop
            from jax import lax

            nz = r.shape[-1]
            roots_p = jnp.concatenate([r[0::2], r[1::2]], axis=0)

            def leg_body(i, carry):
                z0 = i * fleg
                Ge, Go = S._correlated_GeGo(
                    op, tt, roots_p, key, z0, fleg, jnp.float32)

                def ring_body(j, c2):
                    ge = lax.dynamic_slice_in_dim(Ge, j * fchunk, fchunk, 0)
                    go = lax.dynamic_slice_in_dim(Go, j * fchunk, fchunk, 0)
                    return c2 + rfn(tt, ge, go)

                return lax.fori_loop(0, fleg // fchunk, ring_body, carry)

            return lax.fori_loop(0, nz // fleg, leg_body, jnp.float32(0.0))

        return jax.jit(_one)

    results = {}
    for mode in ["noring", "expand", "eq", "cap", "full"]:
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

    base = results["noring"]
    print("# --- subtraction ---", file=sys.stderr)
    for mode in ["expand", "eq", "cap", "full"]:
        print(f"# {mode:7s} - noring = {results[mode]-base:+.4f}s",
              file=sys.stderr)
    print(f"# ring total (full - noring): {results['full']-base:.4f}s",
          file=sys.stderr)
    import json

    print(json.dumps({"nside": nside, "nfreq": nfreq, **results}))


if __name__ == "__main__":
    main()
