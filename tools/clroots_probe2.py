"""v5e timing: factorized cl_grid_combined + eigh roots vs the old chunked grid."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

t_start = time.time()
def mark(s): print(f"[{time.time()-t_start:7.1f}s] {s}", flush=True)

jax.config.update("jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

t0 = time.time()
float(jax.jit(lambda x: (x + 1.0).sum())(jnp.zeros(8, jnp.float32)))
mark(f"flush: {time.time()-t0:.1f}s")

from cora_tpu.signal.corr21cm import Corr21cm
from cora_tpu.signal import clfast

nside, nfreq = 512, 256
lmax = 3 * nside - 1
freqs = np.linspace(400.0, 800.0, nfreq, endpoint=False)
model = Corr21cm()

t0 = time.time()
td = clfast.build_cl_tables_device(model, freqs)
float(jnp.sum(jnp.abs(td["dd"][::37, ::371])))
mark(f"cl tables built+forced: {time.time()-t0:.1f}s")

t0 = time.time()
N = clfast._cl_grid_combined_N_jit(td)
float(jnp.sum(jnp.abs(N[::131])))
mark(f"N matrix (y-combined): {time.time()-t0:.1f}s")

t0 = time.time()
cla = clfast.cl_grid_combined(td, lmax)
float(jnp.sum(jnp.abs(cla[::17, 0])))
mark(f"full grid (N + xlerp blocks): {time.time()-t0:.1f}s")

t0 = time.time()
roots = clfast._roots_from_cla_jit(cla, 1e-7)
float(jnp.sum(jnp.abs(roots[::17, 0])))
mark(f"eigh roots: {time.time()-t0:.1f}s")

t0 = time.time()
roots2 = clfast.cl_roots_device(td, lmax)
float(jnp.sum(jnp.abs(roots2[::17, 0])))
mark(f"cl_roots_device end-to-end (warm): {time.time()-t0:.1f}s")
mark("TOTAL")
