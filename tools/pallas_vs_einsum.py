"""Measure: Pallas Legendre kernel vs the XLA einsum path on real TPU.

VERDICT round-1 item 5: ops/pallas_legendre.py existed as "an alternative
implementation" with no recorded decision.  This tool times, on the real
chip, at matched semantics (H[f,r,m] = Σ_ℓ λ[ℓ,r,m]·a[f,ℓ,m], complex a as
re/im planes, f32 highest-precision MXU):

  a. the Pallas pipelined kernel on the dense Λ table,
  b. the XLA einsum on the SAME dense table,
  c. the production parity-packed ragged-chunk einsum path
     (_legendre_contract_cached), which does ~4× less work than (a)/(b)
     by skipping the ℓ<m zero triangle and splitting parities.

Run on the TPU box:  python tools/pallas_vs_einsum.py --nside 256 --f 4
Results land in BASELINE.md's "Pallas vs einsum" row.
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
    ap.add_argument("--nside", type=int, default=256)
    ap.add_argument("--f", type=int, default=4, help="frequency batch")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--inner", type=int, default=8,
                    help="in-program iterations (amortizes the axon "
                         "tunnel's per-dispatch latency)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--l-tile", type=int, default=64)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cora_tpu.healpix.sht import SHT
    from cora_tpu.ops.pallas_legendre import (
        dense_lambda,
        legendre_contract_pallas,
    )
    from cora_tpu.util import xfer

    nside = args.nside
    lmax = 3 * nside - 1
    L = lmax + 1
    nh = 2 * nside
    F = args.f

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
             l_chunk=64)
    t0 = time.time()
    lam_dense = dense_lambda(op)  # [L, nh, L] f32
    print(f"# dense lambda build: {time.time()-t0:.1f}s "
          f"({lam_dense.nbytes/2**30:.2f} GiB)", file=sys.stderr)

    rng = np.random.RandomState(0)
    tri = (np.arange(L)[None, :] <= np.arange(L)[:, None]).astype(np.float32)
    a_re = rng.randn(F, L, L).astype(np.float32) * tri
    a_im = rng.randn(F, L, L).astype(np.float32) * tri
    a_re0, a_im0 = a_re, a_im

    # pad L/R/M up to tile multiples for the pallas grid (zero rows/cols
    # contribute nothing; einsum comparisons use the same padded shapes)
    def up(n, t):
        return -(-n // t) * t

    Lp, Rp, Mp = up(L, args.l_tile), up(nh, 128), up(L, 128)
    lam_dense = np.pad(lam_dense,
                       [(0, Lp - L), (0, Rp - nh), (0, Mp - L)])
    a_re = np.pad(a_re, [(0, 0), (0, Lp - L), (0, Mp - L)])
    a_im = np.pad(a_im, [(0, 0), (0, Lp - L), (0, Mp - L)])

    lam_d = xfer.put(lam_dense)
    are_d = xfer.put(a_re)
    aim_d = xfer.put(a_im)

    flops = 4.0 * F * L * nh * L  # two real contractions, MAC=2

    K = args.inner

    def bench(name, fn, *xs):
        # the axon runtime's block_until_ready does not reliably wait;
        # synchronize the way bench.py does — fetch a device scalar.  The
        # measured program runs the op K times (varying an input scalar so
        # XLA cannot CSE the loop away) to amortize tunnel latency.
        float(fn(*xs))
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            float(fn(*xs))
            times.append(time.time() - t0)
        best = min(times) / K
        print(f"{name}: {best*1e3:.3f} ms   {flops/best/1e12:.2f} TFLOP/s "
              f"(logical; x3 bf16 passes at highest precision)")
        return best

    def k_loop(body):
        def run(*xs):
            def step(i, acc):
                return acc + body(xs[0], xs[1] + i * 0.0, *xs[2:])
            return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))
        return jax.jit(run)

    # a. pallas kernel (scalar-reduced in the same program for sync)
    def pallas_body(l_, r_, i_):
        hre, him = legendre_contract_pallas(
            l_, r_, i_, r_tile=128, m_tile=128, l_tile=args.l_tile,
            interpret=args.cpu,
        )
        return jnp.sum(jnp.abs(hre)) + jnp.sum(jnp.abs(him))

    t_pallas = bench("pallas ", k_loop(pallas_body), lam_d, are_d, aim_d)

    # b. XLA einsum, identical dense semantics
    def xla_body(l_, r_, i_):
        kw = dict(precision=jax.lax.Precision.HIGHEST)
        return (
            jnp.sum(jnp.abs(jnp.einsum("lrm,flm->frm", l_, r_, **kw)))
            + jnp.sum(jnp.abs(jnp.einsum("lrm,flm->frm", l_, i_, **kw)))
        )

    t_xla = bench("xla    ", k_loop(xla_body), lam_d, are_d, aim_d)

    # c. production parity-packed ragged path (≈4× less logical work)
    tables = op.tables(False)
    from cora_tpu.healpix.sht import _legendre_contract_cached

    alm = (a_re0 + 1j * a_im0).astype(np.complex64)
    alm_d = xfer.put(alm)

    @jax.jit
    def prod_fn(t_, a_):
        def step(i, acc):
            return acc + jnp.sum(
                jnp.abs(_legendre_contract_cached(op, t_, a_ + i * 0.0))
            )
        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

    float(prod_fn(tables, alm_d))
    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        float(prod_fn(tables, alm_d))
        times.append(time.time() - t0)
    t_prod = min(times) / K
    print(f"packed : {t_prod*1e3:.3f} ms   (production path; ~flops/4 = "
          f"{flops/4/t_prod/1e12:.2f} effective TFLOP/s)")

    print(f"\nverdict: pallas/xla dense ratio {t_pallas/t_xla:.2f}; "
          f"production packed einsum vs pallas {t_prod/t_pallas:.2f}")


if __name__ == "__main__":
    main()
