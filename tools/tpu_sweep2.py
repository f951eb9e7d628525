"""Post-banding (fleg, fchunk) retune of the flagship step on the v5e.

The banded cap convolution changed the ring-stage working set, so the
round-1 tuning (fchunk=4, fleg=128) may no longer be optimal.  Loads the
nside=512 tables ONCE (the 6.4 GB transfer dominates a bench.py run) and
times several streaming configs in the same process.

Usage: python tools/tpu_sweep2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(root_dir, ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.healpix.sht import SHT, synthesis_scan_correlated  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

nside, nfreq, lchunk = 512, 256, 256
lmax = 3 * nside - 1

print(f"# device: {jax.devices()[0]}", file=sys.stderr)
t0 = time.time()
roots = np.load(os.path.join(cache_dir, f"roots_{nside}_{nfreq}.npy"))
op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
         l_chunk=lchunk, precision="highest",
         lambda_cache=os.path.join(cache_dir, f"lam_{nside}_{lchunk}.npz"))
tables = xfer.put_tree(op.tables(False))
roots_d = xfer.put(roots)
print(f"# setup+transfer: {time.time()-t0:.1f}s", file=sys.stderr)

CONFIGS = [
    (128, 4),   # round-1 tuned baseline
    (128, 8),
    (128, 16),
    (64, 8),
    (128, 2),
]

for fleg, fchunk in CONFIGS:
    @jax.jit
    def step_fn(key, r, t, fleg=fleg, fchunk=fchunk):
        return synthesis_scan_correlated(
            op, t, r, key, fleg, fchunk,
            lambda g, z, acc: acc + jnp.sum(jnp.abs(g)), jnp.float32(0.0),
        )

    key = jax.random.key(0, impl="rbg")
    try:
        t0 = time.time()
        s = float(step_fn(key, roots_d, tables))
        compile_s = time.time() - t0
        times = []
        for i in range(3):
            k = jax.random.key(i + 1, impl="rbg")
            t0 = time.time()
            float(step_fn(k, roots_d, tables))
            times.append(time.time() - t0)
        print(f"fleg={fleg:4d} fchunk={fchunk:3d}  best={min(times):.3f}s  "
              f"times={['%.3f' % t for t in times]}  (compile {compile_s:.0f}s)"
              f"  sum={s:.4e}")
    except Exception as e:
        print(f"fleg={fleg:4d} fchunk={fchunk:3d}  FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}")
    sys.stdout.flush()
