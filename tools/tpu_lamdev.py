"""Device-built Λ tables (lambda_build="device") validated on the v5e.

Phase A (nside=256): host-built vs device-built cached tables — full-map
RMS difference of a fixed-alm synthesis (both table sets fit HBM).
Phase B (nside=512 flagship): setup-time comparison (device build vs the
host build + 6.4 GB transfer) and the bench step run on device-built
tables (scalar sum must match the host-table run's 1.1427e+05).

Usage: python tools/tpu_lamdev.py [--phase a|b|ab]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--phase", default="ab")
args = p.parse_args()

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(root_dir, ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.healpix.sht import SHT, synthesis_scan_correlated  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

print(f"# device: {jax.devices()[0]}", file=sys.stderr)


def rand_alm(rng, lmax):
    L = lmax + 1
    a = (rng.standard_normal((L, L)) + 1j * rng.standard_normal((L, L)))
    a *= np.arange(L)[None, :] <= np.arange(L)[:, None]
    a[:, 0] = a[:, 0].real
    return a.astype(np.complex64)


if "a" in args.phase:
    nside = 256
    lmax = 3 * nside - 1
    t0 = time.time()
    op_h = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm", l_chunk=64)
    th = xfer.put_tree(op_h.tables(False))
    t_host = time.time() - t0
    t0 = time.time()
    op_d = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm", l_chunk=64,
               lambda_build="device",
               ckpt_cache=os.path.join(cache_dir, f"ckdev_{nside}_64_1.npz"))
    td = xfer.put_tree(op_d.tables(False))
    t_dev = time.time() - t0
    print(f"A: setup host={t_host:.1f}s device={t_dev:.1f}s")

    alm = xfer.put(rand_alm(np.random.RandomState(0), lmax))
    mh = op_h.synthesis(alm)
    md = op_d.synthesis(alm)
    num = jnp.sqrt(jnp.mean((mh - md) ** 2))
    den = jnp.sqrt(jnp.mean(mh**2))
    print(f"A: nside=256 full-map RMS(dev vs host) = {float(num/den):.3e}")
    del th, td, op_h, op_d, mh, md

if "b" in args.phase:
    nside, nfreq, lchunk, fleg, fchunk = 512, 256, 256, 128, 4
    lmax = 3 * nside - 1
    roots = np.load(os.path.join(cache_dir, f"roots_{nside}_{nfreq}.npy"))
    t0 = time.time()
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
             l_chunk=lchunk, precision="highest", lambda_build="device",
             ckpt_cache=os.path.join(cache_dir, f"ckdev_{nside}_{lchunk}_1.npz"))
    t_init = time.time() - t0
    t0 = time.time()
    tables = xfer.put_tree(op.tables(False))
    t_build = time.time() - t0
    roots_d = xfer.put(roots)
    print(f"B: init (incl. ck host build if cold) {t_init:.1f}s; "
          f"device Λ build {t_build:.1f}s "
          f"(host path measured: build ~150s + 6.4 GB transfer 240-380s)")

    @jax.jit
    def step_fn(key, r, t):
        return synthesis_scan_correlated(
            op, t, r, key, fleg, fchunk,
            lambda g, z, acc: acc + jnp.sum(jnp.abs(g)), jnp.float32(0.0),
        )

    key = jax.random.key(0, impl="rbg")
    t0 = time.time()
    s = float(step_fn(key, roots_d, tables))
    print(f"B: warmup {time.time()-t0:.1f}s sum={s:.6e} "
          f"(host-table run: 1.1427e+05)")
    times = []
    for i in range(3):
        k = jax.random.key(i + 1, impl="rbg")
        t0 = time.time()
        float(step_fn(k, roots_d, tables))
        times.append(time.time() - t0)
    print(f"B: step best={min(times):.3f}s times={['%.3f' % t for t in times]}")
