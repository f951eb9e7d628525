"""Attribute the flagship first-step cost stage by stage (axon TPU).

The bench dispatches the device C_l/roots programs and the SHT table
transfers asynchronously; the first step is the sync point for all of
them, so BENCH warmup_s conflates their execution with the step itself.
This probe forces every stage separately.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

t_start = time.time()
def mark(s):
    print(f"[{time.time()-t_start:7.1f}s] {s}", flush=True)

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

dev = jax.devices()[0]
mark(f"device: {dev}")
t0 = time.time()
_flush = jax.jit(lambda x: x + 1.0)(jnp.zeros(8, jnp.float32))
_flush.block_until_ready()
mark(f"backend flush: {time.time()-t0:.1f}s")

from cora_tpu.signal.corr21cm import Corr21cm
from cora_tpu.signal import clfast
from cora_tpu.healpix.sht import SHT, synthesis_scan_correlated
from cora_tpu.util import xfer

nside, nfreq = 512, 256
lmax = 3 * nside - 1
freqs = np.linspace(400.0, 800.0, nfreq, endpoint=False)

t0 = time.time()
model = Corr21cm()
mark(f"Corr21cm(): {time.time()-t0:.1f}s")

t0 = time.time()
td = clfast.build_cl_tables_device(model, freqs)
mark(f"build_cl_tables_device dispatch: {time.time()-t0:.1f}s")
t0 = time.time()
jax.block_until_ready(td)
mark(f"  ...tables executed: {time.time()-t0:.1f}s")

t0 = time.time()
roots_d = clfast.cl_roots_device(td, lmax)
mark(f"cl_roots_device dispatch: {time.time()-t0:.1f}s")
t0 = time.time()
roots_d.block_until_ready()
mark(f"  ...roots executed: {time.time()-t0:.1f}s")
del td

t0 = time.time()
op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
         l_chunk=256, precision="highest", fft_cmul="xla",
         lambda_build="device",
         ckpt_cache=os.path.join(cache_dir, "ck_512_256_1.npz"),
         lambda_cache=os.path.join(cache_dir, "lam_512_256.npz"))
mark(f"SHT(): {time.time()-t0:.1f}s")
t0 = time.time()
tabs = op.tables(False)
mark(f"op.tables(False): {time.time()-t0:.1f}s")
t0 = time.time()
sht_tables = xfer.put_tree(tabs)
mark(f"put_tree dispatch: {time.time()-t0:.1f}s")
t0 = time.time()
jax.block_until_ready(sht_tables)
mark(f"  ...tables on device: {time.time()-t0:.1f}s")

fchunk, fleg = 4, 128
def _one(key, r, t):
    return synthesis_scan_correlated(
        op, t, r, key, fleg, fchunk,
        lambda g, z, acc: acc + jnp.sum(jnp.abs(g)), jnp.float32(0.0),
        xi_dtype=jnp.float32)
step_fn = jax.jit(_one)

import pickle
exe_path = os.path.join(cache_dir,
    f"exe_512_256_4_128_256_cached_f32_highest_1_{jax.__version__}_TPUv5lite.pkl")
t0 = time.time()
key0 = jax.random.key(0, impl="rbg")
jax.block_until_ready(jax.random.key_data(key0))
mark(f"rbg key: {time.time()-t0:.1f}s")
t0 = time.time()
from jax.experimental.serialize_executable import deserialize_and_load
with open(exe_path, "rb") as fh:
    compiled = deserialize_and_load(*pickle.load(fh))
mark(f"exe load: {time.time()-t0:.1f}s")
t0 = time.time()
out = compiled(key0, roots_d, sht_tables)
v = float(out)
mark(f"first step: {time.time()-t0:.1f}s sum={v:.3e}")
for i in range(2):
    k = jax.random.key(i + 1, impl="rbg")
    t0 = time.time()
    float(compiled(k, roots_d, sht_tables))
    mark(f"step {i}: {time.time()-t0:.2f}s")
mark("TOTAL")
