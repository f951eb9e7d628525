"""Zel'dovich SPH density-assignment bench on the real TPU.

The LSS pipeline's hot scatter loop (reference cora/signal/lss.py:1305-1419
+ cora/util/pmesh.pyx — OpenMP atomic scatter-add over nchi x npix
particles x 9 pixels x 3 radial bins) runs here as the deterministic XLA
scatter-add of cora_tpu.ops.pmesh.za_density_sph, fully on-device.

Times the jitted end-to-end step (displacement -> reposition -> ang2pix ->
SPH weights -> scatter-add) on smooth random fields and reports particles/s.
Prints ONE JSON line like bench.py (this is the secondary, non-driver
bench; the driver's bench.py stays the synthesis flagship).

Usage: python tools/bench_za.py [--nside 256] [--nchi 64] [--cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--nside", type=int, default=256)
p.add_argument("--nchi", type=int, default=64)
p.add_argument("--repeats", type=int, default=3)
p.add_argument("--cpu", action="store_true")
p.add_argument("--deposit", default="auto",
               choices=["auto", "scatter", "window", "offset"])
args = p.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.ops import pmesh  # noqa: E402
from cora_tpu.healpix import pixel as hpx  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

nside, nchi = args.nside, args.nchi
npix = hpx.nside2npix(nside)
print(f"# device: {jax.devices()[0]}  npix={npix} nchi={nchi}",
      file=sys.stderr)

# smooth random inputs (host): low-order harmonic fields, physical scales
rng = np.random.RandomState(0)
t0 = time.time()
geom = pmesh.sph_geometry(nside, rings=True)
chi = np.linspace(1500.0, 2500.0, nchi)
th, ph = geom["angpos"]
f32 = np.float32


def smooth_field(k):
    return (
        np.sin(3 * th + k) * np.cos(2 * ph - k) + 0.5 * np.sin(5 * ph + 2 * k)
    ).astype(f32)


dchi = float(np.mean(np.diff(chi)))
psi = np.stack(
    [
        1.5 * dchi * smooth_field(0)[None].repeat(nchi, 0),  # radial
        0.002 * smooth_field(1)[None].repeat(nchi, 0),  # theta
        0.002 * smooth_field(2)[None].repeat(nchi, 0),  # phi
    ]
)
delta_m = 0.3 * smooth_field(3)[None].repeat(nchi, 0)
delta_b = 1.2 * delta_m

geom_d = xfer.put_tree(
    {k: np.asarray(v, f32 if np.asarray(v).dtype.kind == "f" else None)
     for k, v in geom.items()}
)
psi_d = xfer.put(psi.astype(f32))
db_d = xfer.put(delta_b)
dm_d = xfer.put(delta_m)
chi_h = chi.astype(f32)  # host: za_density_sph inspects ordering/steps
print(f"# setup+transfer: {time.time()-t0:.1f}s", file=sys.stderr)


@jax.jit
def step(psi_, db_, dm_, g):
    out = pmesh.za_density_sph(psi_, db_, dm_, chi_h, nside, geometry=g,
                               deposit=args.deposit)
    return out, jnp.sum(jnp.abs(out))


t0 = time.time()
out, s = step(psi_d, db_d, dm_d, geom_d)
s = float(s)
print(f"# warmup (incl. compile): {time.time()-t0:.1f}s sum={s:.3e}",
      file=sys.stderr)

# sanity: SPH assignment conserves mass per construction; total mass of
# (1 + delta_bias) over interior slices stays within transport tolerance
total = float(jnp.sum(out) + out.size)
expect = float(np.sum(1.0 + delta_b))
assert abs(total - expect) / expect < 0.02, (total, expect)

ts = []
for _ in range(args.repeats):
    t0 = time.time()
    float(step(psi_d, db_d, dm_d, geom_d)[1])
    ts.append(time.time() - t0)
dt = min(ts)
particles = nchi * npix
print(f"# times: {[f'{t:.2f}' for t in ts]}", file=sys.stderr)
print(json.dumps({
    "metric": f"ZA SPH density (nside={nside} x {nchi} chi)",
    "deposit": args.deposit,
    "value": round(dt, 3),
    "unit": "s",
    "particles_per_s": round(particles / dt / 1e6, 1),
    "unit2": "Mparticles/s",
    "device_kind": jax.devices()[0].device_kind,
}))
