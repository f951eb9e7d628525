"""XLA scatter-add strategy probe for the SPH deposit (v5e).

Variants at the production slice shape (npix sources x 9 pixel
neighbours x 3 radial bins):
  flat      — 21M scalar updates into [nchi*npix] (current bin_delta)
  windowed  — 7M updates of contiguous [3]-windows along a minor radial
              axis in [npix, nchi] layout (3x fewer scatter rows)
  per-slot  — 27 separate npix-sized scalar scatters (source-ordered)

Usage: python tools/tpu_scatter_probe.py [--nside 256] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

p = argparse.ArgumentParser()
p.add_argument("--nside", type=int, default=256)
p.add_argument("--nchi", type=int, default=8)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.healpix import pixel as hpx  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

nside, nchi = args.nside, args.nchi
npix = hpx.nside2npix(nside)
K = 8
print(f"# device: {jax.devices()[0]} npix={npix}", file=sys.stderr)

rng = np.random.RandomState(0)
# realistic-ish targets: pixel neighbours near the source pixel, radial low
pix = (np.arange(npix)[:, None] + rng.randint(-1030, 1030, (npix, 9))) % npix
low = rng.randint(0, nchi - 2, npix)
w = rng.rand(npix, 3, 9).astype(np.float32)
pix_d = xfer.put(pix.astype(np.int32))
low_d = xfer.put(low.astype(np.int32))
w_d = xfer.put(w)


def timeit(fn, *a):
    r = jax.block_until_ready(fn(*a))
    t0 = time.time()
    jax.block_until_ready(fn(*a))
    dt = (time.time() - t0) / K
    return dt, r


@jax.jit
def flat(pix, low, w):
    out = jnp.zeros((nchi * npix,), jnp.float32)
    for i in range(K):
        rad = low[:, None] + jnp.arange(3)[None, :]
        idx = rad[:, :, None] * npix + pix[:, None, :]
        out = out.at[idx.reshape(-1)].add((w + 1e-6 * i).reshape(-1))
    return out


@jax.jit
def windowed(pix, low, w):
    # layout [npix, nchi]: each (source, neighbour) deposits a [1, 3]
    # window at (pix_j, low)
    out = jnp.zeros((npix, nchi), jnp.float32)
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1),
    )
    for i in range(K):
        idx = jnp.stack(
            [pix.T.reshape(-1), jnp.tile(low, 9)], axis=1
        )  # [9*npix, 2]
        upd = (w + 1e-6 * i).transpose(2, 0, 1).reshape(-1, 3)  # [9*npix, 3]
        out = lax.scatter_add(
            out, idx, upd, dnums,
            indices_are_sorted=False, unique_indices=False,
        )
    return out.T


@jax.jit
def per_slot(pix, low, w):
    out = jnp.zeros((nchi * npix,), jnp.float32)
    for i in range(K):
        for k in range(3):
            rad = low + k
            for j in range(9):
                idx = rad * npix + pix[:, j]
                out = out.at[idx].add(w[:, k, j] + 1e-6 * i)
    return out


t1, r1 = timeit(flat, pix_d, low_d, w_d)
print(f"flat 21M scalar:   {t1*1e3:7.1f} ms  ({npix*27/t1/1e6:.0f} M adds/s)")
t2, r2 = timeit(windowed, pix_d, low_d, w_d)
print(f"windowed 7M x [3]: {t2*1e3:7.1f} ms  ({npix*27/t2/1e6:.0f} M adds/s)")
t3, r3 = timeit(per_slot, pix_d, low_d, w_d)
print(f"27 x npix scalar:  {t3*1e3:7.1f} ms  ({npix*27/t3/1e6:.0f} M adds/s)")

# correctness cross-check (sum-order differences only)
a = np.asarray(r1).reshape(nchi, npix)
b = np.asarray(r2).reshape(nchi, npix)
c = np.asarray(r3).reshape(nchi, npix)
print(f"max|flat-windowed| = {np.abs(a - b).max():.2e}, "
      f"max|flat-perslot| = {np.abs(a - c).max():.2e}, scale {a.max():.2e}")
