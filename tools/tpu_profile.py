import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from cora_tpu.healpix.sht import SHT
from cora_tpu.core.skysim import draw_correlated_alm

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 32
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 8
lmax = 3 * nside - 1

t0 = time.time()
op = SHT(nside, lmax, legendre_mode="cached")
print(f"SHT setup (cached Lambda): {time.time()-t0:.1f}s", flush=True)

rng = np.random.RandomState(0)
L = lmax + 1
alm = (rng.randn(nz, L, L) + 1j * rng.randn(nz, L, L)).astype(np.complex64)
alm_d = jnp.asarray(alm)

t0 = time.time()
sky = op.synthesis(alm_d)
sky.block_until_ready()
print(f"synthesis compile+run: {time.time()-t0:.1f}s", flush=True)

for i in range(3):
    t0 = time.time()
    sky = op.synthesis(alm_d)
    sky.block_until_ready()
    print(f"synthesis run: {time.time()-t0:.3f}s", flush=True)

corr = np.ones((L, nz, nz), np.float32) * np.eye(nz, dtype=np.float32)
corr_d = jnp.asarray(corr)
key = jax.random.PRNGKey(0)
f = jax.jit(lambda c, k: draw_correlated_alm(c, k, dtype=jnp.complex64))
t0 = time.time()
a = f(corr_d, key).block_until_ready()
print(f"draw compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
a = f(corr_d, key).block_until_ready()
print(f"draw run: {time.time()-t0:.3f}s", flush=True)
