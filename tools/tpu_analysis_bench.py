"""Device-side analysis (map2alm / anafast) timings on the v5e.

Times the grid-layout Jacobi analysis (device-safe production path) and
one anafast at nside=128/256 for a batch of channels — the estimator
workloads (lssutil.pk_flat / corrfunc / transfer) run this per chi-slice.

Usage: python tools/tpu_analysis_bench.py [--nside 256] [--nz 16]
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
p.add_argument("--nside", type=int, default=256)
p.add_argument("--nz", type=int, default=16)
p.add_argument("--iter", type=int, default=3)
p.add_argument("--method", default="jacobi", choices=["jacobi", "cg"])
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(root_dir, ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.healpix.sht import (  # noqa: E402
    SHT, _analysis_grid, _analysis_cg_grid, _synthesis_grid,
)
from cora_tpu.util import xfer  # noqa: E402

nside, nz = args.nside, args.nz
lmax = 3 * nside - 1
print(f"# device: {jax.devices()[0]}", file=sys.stderr)

t0 = time.time()
op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm", l_chunk=64,
         lambda_build="device",
         ckpt_cache=os.path.join(cache_dir, f"ckdev_{nside}_64_1.npz"))
t = xfer.put_tree(op.tables(False))
print(f"# setup (device Lambda build): {time.time()-t0:.1f}s", file=sys.stderr)

rng = np.random.RandomState(0)
L = lmax + 1
alm = (rng.standard_normal((nz, L, L)) + 1j * rng.standard_normal((nz, L, L)))
alm *= np.arange(L)[None, None, :] <= np.arange(L)[None, :, None]
alm[..., 0] = alm[..., 0].real
alm = alm.astype(np.complex64)
alm_d = xfer.put(alm)


@jax.jit
def synth(t, a):
    g = _synthesis_grid(op, t, a)
    return g, jnp.sum(jnp.abs(g))


@jax.jit
def ana(t, g):
    if args.method == "cg":
        a = _analysis_cg_grid(op, t, g, args.iter)
    else:
        a = _analysis_grid(op, t, g, args.iter)
    return a, jnp.sum(jnp.abs(a))


t0 = time.time()
g, s = synth(t, alm_d)
print(f"# synth warmup {time.time()-t0:.1f}s sum={float(s):.4e}", file=sys.stderr)
t0 = time.time()
float(synth(t, alm_d)[1])
dt_s = time.time() - t0

t0 = time.time()
a2, s2 = ana(t, g)
print(f"# analysis warmup {time.time()-t0:.1f}s sum={float(s2):.4e}",
      file=sys.stderr)
t0 = time.time()
float(ana(t, g)[1])
dt_a = time.time() - t0

# round-trip accuracy on device (band-limited input)
num = float(jnp.linalg.norm((a2 - alm_d)[..., 1:]))
den = float(jnp.linalg.norm(alm_d[..., 1:]))
lb = 2 * nside
numb = float(jnp.linalg.norm((a2 - alm_d)[:, :lb, 1:]))
denb = float(jnp.linalg.norm(alm_d[:, :lb, 1:]))

mtag = ("cg" if args.method == "cg" else "j") + str(args.iter)
print(f"synthesis  (nz={nz}, nside={nside}): {dt_s:.3f} s "
      f"({dt_s/nz*1e3:.1f} ms/map)")
print(f"analysis {mtag} (nz={nz}, nside={nside}): {dt_a:.3f} s "
      f"({dt_a/nz*1e3:.1f} ms/map)")
print(f"alm round-trip rel (full lmax, f32): {num/den:.3e}")
print(f"alm round-trip rel (l <= 2 nside):   {numb/denb:.3e}")
