import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from cora_tpu.healpix.sht import SHT, _synthesis
from cora_tpu.core.skysim import draw_correlated_alm

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 32
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 8
lmax = 3 * nside - 1

t0 = time.time()
op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm")
print(f"SHT setup (cached Lambda): {time.time()-t0:.1f}s", flush=True)

rng = np.random.RandomState(0)
L = lmax + 1
alm = (rng.randn(nz, L, L) + 1j * rng.randn(nz, L, L)).astype(np.complex64)
alm_d = jnp.asarray(alm)
tables = op.tables(False)

# timed program returns a scalar so the readback forces real execution
# without shipping the cube over the (slow) tunnel
synth_sum = jax.jit(
    lambda t, a: jnp.sum(jnp.abs(_synthesis(op, t, a))), static_argnums=()
)

t0 = time.time()
s = float(synth_sum(tables, alm_d))
print(f"synthesis compile+run: {time.time()-t0:.1f}s (sum={s:.3e})", flush=True)

for i in range(3):
    t0 = time.time()
    s = float(synth_sum(tables, alm_d))
    print(f"synthesis run: {time.time()-t0:.3f}s", flush=True)

# draw timing
corr = (np.ones((L, nz, nz)) * np.eye(nz)).astype(np.float32)
corr_d = jnp.asarray(corr)
key = jax.random.PRNGKey(0)
draw_sum = jax.jit(
    lambda c, k: jnp.sum(jnp.abs(draw_correlated_alm(c, k, dtype=jnp.complex64)))
)
t0 = time.time()
s = float(draw_sum(corr_d, key))
print(f"draw compile+run: {time.time()-t0:.1f}s", flush=True)
for i in range(2):
    t0 = time.time()
    s = float(draw_sum(corr_d, key))
    print(f"draw run: {time.time()-t0:.3f}s", flush=True)

# fused draw+synthesis
step = jax.jit(
    lambda t, c, k: jnp.sum(
        jnp.abs(_synthesis(op, t, draw_correlated_alm(c, k, dtype=jnp.complex64)))
    )
)
t0 = time.time()
s = float(step(tables, corr_d, key))
print(f"fused step compile+run: {time.time()-t0:.1f}s", flush=True)
for i in range(2):
    t0 = time.time()
    s = float(step(tables, corr_d, key))
    print(f"fused step run: {time.time()-t0:.3f}s", flush=True)
