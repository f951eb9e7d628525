"""Stencil vs scatter ZA deposit benchmark (VERDICT r2 item 7).

The stencil deposit (ops/pmesh.py _stencil_deposit) replaces the belt
two-thirds of the scatter volume with static masked roll-adds — pure
VPU streaming, zero scatter.  Usage:

    python tools/bench_stencil.py [nside] [nchi]
"""
import sys, time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from cora_tpu.ops import pmesh

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 256
nchi = int(sys.argv[2]) if len(sys.argv) > 2 else 64
npix = 12 * nside**2
print(f"# device={jax.devices()[0]} nside={nside} nchi={nchi} "
      f"updates={27*nchi*npix/1e6:.0f}M", flush=True)

chi = np.linspace(2000.0, 2400.0, nchi)
rng = np.random.default_rng(0)
dchi = float(np.mean(np.diff(chi)))
res = 1.0 / nside
psi = np.stack([
    0.3 * dchi * rng.standard_normal((nchi, npix)),
    0.3 * res * rng.standard_normal((nchi, npix)),
    0.3 * res * rng.standard_normal((nchi, npix)),
]).astype(np.float32)
db = (0.1 * rng.standard_normal((nchi, npix))).astype(np.float32)
dm = (0.1 * rng.standard_normal((nchi, npix))).astype(np.float32)

from cora_tpu.util import xfer
args = (xfer.put(psi), xfer.put(db), xfer.put(dm), xfer.put(chi.astype(np.float32)), nside)

res_d = {}
for dep in ("scatter", "stencil"):
    f = jax.jit(lambda a, b, c, d: pmesh.za_density_sph(
        a, b, c, d, nside, deposit=dep))
    t0 = time.time()
    out = jax.block_until_ready(f(*args[:4]))
    print(f"# {dep}: warmup+compile {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(2):
        t0 = time.time()
        out = jax.block_until_ready(f(*args[:4]))
        ts.append(time.time() - t0)
    best = min(ts)
    res_d[dep] = (best, out)
    print(f"# {dep}: {best:.2f}s  ({27*nchi*npix/best/1e6:.0f} M updates/s)",
          flush=True)

dev = float(jnp.max(jnp.abs(res_d["stencil"][1] - res_d["scatter"][1])))
sc = float(jnp.max(jnp.abs(res_d["scatter"][1])))
fin = bool(jnp.all(jnp.isfinite(res_d["stencil"][1])))
print(f"# equality: max|dev|={dev:.2e} scale={sc:.2e} finite={fin}", flush=True)
print(f"# speedup: {res_d['scatter'][0]/res_d['stencil'][0]:.2f}x", flush=True)
