"""Measure: complex-alm einsum vs explicit re/im split-plane einsums.

The production Legendre contraction (cora_tpu/healpix/sht.py
_legendre_contract_cached/_streamed) contracts a REAL f32 Λ chunk against
COMPLEX64 alm rows.  XLA compiles the mixed c64×f32 dot as a 3-multiply
complex matmul (verified in HLO: three real convolution-base-dilated
instances), but with Λ purely real only 2 real contractions are needed
(λ·re, λ·im).  This probe times, on the real chip at a flagship-like
chunk shape, K in-program iterations of:

  a. the mixed complex einsum as production uses it today
  b. two real einsums on split planes, recombined with lax.complex

Run:  python tools/complex_vs_split.py --L 1536 --nh 1024 --f 4
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=1536)
    ap.add_argument("--nh", type=int, default=1024)
    ap.add_argument("--f", type=int, default=4)
    ap.add_argument("--lrows", type=int, default=256,
                    help="rows per parity-packed chunk (l_chunk=512 → 256)")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cora_tpu.util import xfer

    L, nh, F, R = args.L, args.nh, args.f, args.lrows
    K = args.inner
    prec = jax.lax.Precision.HIGHEST

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.RandomState(0)
    lam = rng.randn(L, R, nh).astype(np.float32)  # [m, lrows, ring]
    are = rng.randn(F, R, L).astype(np.float32)
    aim = rng.randn(F, R, L).astype(np.float32)

    lam_d = xfer.put(lam)
    are_d = xfer.put(are)
    aim_d = xfer.put(aim)

    # logical flops for the two necessary real contractions, MAC=2 each
    flops = 2 * (2.0 * F * L * R * nh)

    def bench(name, fn, *xs):
        float(fn(*xs))
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            float(fn(*xs))
            times.append(time.time() - t0)
        best = min(times) / K
        print(f"{name}: {best*1e3:.3f} ms   {flops/best/1e12:.2f} "
              f"useful TFLOP/s")
        return best

    # a. mixed complex einsum (production today)
    @jax.jit
    def complex_fn(l_, re_, im_):
        a = jax.lax.complex(re_, im_)

        def step(i, acc):
            X = jnp.einsum("mlr,flm->frm", l_, a + (i * 0.0), precision=prec)
            return acc + jnp.sum(jnp.abs(X))

        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

    t_c = bench("complex    ", complex_fn, lam_d, are_d, aim_d)

    # b. split planes: two real einsums
    @jax.jit
    def split_fn(l_, re_, im_):
        def step(i, acc):
            Xr = jnp.einsum("mlr,flm->frm", l_, re_ + i * 0.0, precision=prec)
            Xi = jnp.einsum("mlr,flm->frm", l_, im_ + i * 0.0, precision=prec)
            return acc + jnp.sum(jnp.abs(Xr)) + jnp.sum(jnp.abs(Xi))

        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

    t_s = bench("split-plane", split_fn, lam_d, are_d, aim_d)

    print(f"\nverdict: complex/split ratio {t_c/t_s:.2f}")


if __name__ == "__main__":
    main()
