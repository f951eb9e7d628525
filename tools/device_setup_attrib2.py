"""Attribution round 2: force each queued device stage with a D2H fetch.

block_until_ready on the axon backend does not synchronize (probe 1:
3.2 GB of tables 'ready' in 0.0s, then a 682.8s 'first step'); a scalar
fetch does.  Each stage below ends with float(sum(|x|)) to pin its real
execution cost.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

t_start = time.time()
def mark(s):
    print(f"[{time.time()-t_start:7.1f}s] {s}", flush=True)

def force(x, label):
    t0 = time.time()
    if isinstance(x, (list, tuple, dict)):
        leaves = jax.tree_util.tree_leaves(x)
        v = sum(float(jnp.sum(jnp.abs(l.ravel()[::max(l.size//4096,1)]))) for l in leaves)
    else:
        v = float(jnp.sum(jnp.abs(x.ravel()[::max(x.size//4096,1)])))
    mark(f"FORCE {label}: {time.time()-t0:.1f}s (probe sum {v:.3e})")

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

dev = jax.devices()[0]
t0 = time.time()
float(jax.jit(lambda x: (x + 1.0).sum())(jnp.zeros(8, jnp.float32)))
mark(f"backend flush+fetch: {time.time()-t0:.1f}s")

from cora_tpu.signal.corr21cm import Corr21cm
from cora_tpu.signal import clfast
from cora_tpu.healpix.sht import SHT
from cora_tpu.util import xfer

nside, nfreq = 512, 256
lmax = 3 * nside - 1
freqs = np.linspace(400.0, 800.0, nfreq, endpoint=False)
model = Corr21cm()

t0 = time.time()
td = clfast.build_cl_tables_device(model, freqs)
mark(f"build_cl_tables_device dispatch: {time.time()-t0:.1f}s")
force(td, "cl tables")

# split cl_roots_device into its two halves by hand: grid then eigh
t0 = time.time()
cla = clfast.cl_grid_device(td, lmax) if hasattr(clfast, "cl_grid_device") else None
if cla is not None:
    mark(f"cl_grid_device dispatch: {time.time()-t0:.1f}s")
    force(cla, "cl grid")
    t0 = time.time()
    roots_d = clfast.roots_from_cla_device(cla) if hasattr(clfast, "roots_from_cla_device") else None
    if roots_d is None:
        mark("no roots_from_cla_device; using cl_roots_device on fresh tables")
        roots_d = clfast.cl_roots_device(td, lmax)
    else:
        mark(f"roots dispatch: {time.time()-t0:.1f}s")
else:
    mark("no cl_grid_device helper; cl_roots_device fused")
    roots_d = clfast.cl_roots_device(td, lmax)
    mark("cl_roots_device dispatched")
force(roots_d, "roots (eigh)")

t0 = time.time()
op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
         l_chunk=256, precision="highest", fft_cmul="xla",
         lambda_build="device",
         ckpt_cache=os.path.join(cache_dir, "ck_512_256_1.npz"),
         lambda_cache=os.path.join(cache_dir, "lam_512_256.npz"))
tabs = op.tables(False)
sht_tables = xfer.put_tree(tabs)
mark(f"SHT + tables + put_tree dispatch: {time.time()-t0:.1f}s")
for k, v in sht_tables.items():
    if isinstance(v, (list, tuple)):
        for i, lv in enumerate(v):
            force(lv, f"tables[{k}][{i}]")
    elif hasattr(v, "ravel") and v.size > 1000000:
        force(v, f"tables[{k}]")
t0 = time.time()
leaves = jax.tree_util.tree_leaves(sht_tables)
v = sum(float(jnp.sum(jnp.abs(l.ravel()[:16].astype(jnp.float32)))) for l in leaves)
mark(f"FORCE all remaining leaves: {time.time()-t0:.1f}s")
mark("TOTAL setup")
