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
chi32 = chi.astype(np.float32)

# Geometry tables go through jit ARGUMENTS, not closures: closure capture
# bakes them into the compile payload as constants, and at nside=512 the
# ~0.5 GB of tables exceeds the tunnelled remote_compile request limit
# (HTTP 413; see BASELINE.md deposit table).
geom_np = pmesh.sph_geometry(nside, device=False)
geom = {
    k: xfer.put(v.astype(np.int32) if v.dtype.kind == "i"
                else v.astype(np.float32))
    for k, v in geom_np.items()
}
del geom_np
args = (xfer.put(psi), xfer.put(db), xfer.put(dm))

res_d = {}
for dep, vec in (("scatter", "table"), ("stencil", "table"),
                 ("stencil", "arith")):
    # chi stays host-side: za_density_sph checks its ordering eagerly.
    # Sync via a scalar fetch: block_until_ready does NOT block on the
    # tunnelled axon runtime (same pattern as tools/bench_za.py).
    def run(a, b, c, g, _dep=dep, _vec=vec):
        out = pmesh.za_density_sph(a, b, c, chi32, nside, deposit=_dep,
                                   vectors=_vec, geometry=g)
        return out, jnp.sum(jnp.abs(out))
    dep = f"{dep}/{vec}"
    f = jax.jit(run)
    t0 = time.time()
    out, sm = f(*args, geom)
    sm = float(sm)
    print(f"# {dep}: warmup+compile {time.time()-t0:.1f}s sum={sm:.4e}",
          flush=True)
    ts = []
    for _ in range(2):
        t0 = time.time()
        out, sm = f(*args, geom)
        float(sm)
        ts.append(time.time() - t0)
    best = min(ts)
    res_d[dep] = (best, out)  # out fetched below via xfer-safe compare
    print(f"# {dep}: {best:.2f}s  ({27*nchi*npix/best/1e6:.0f} M updates/s)",
          flush=True)

cmp = jax.jit(lambda x, y: (jnp.max(jnp.abs(x - y)), jnp.max(jnp.abs(y)),
                            jnp.all(jnp.isfinite(x))))
base = res_d["scatter/table"]
for k in ("stencil/table", "stencil/arith"):
    d_, s_, f_ = cmp(res_d[k][1], base[1])
    print(f"# {k}: max|dev|={float(d_):.2e} scale={float(s_):.2e} "
          f"finite={bool(f_)} speedup={base[0]/res_d[k][0]:.2f}x", flush=True)
