"""Executed proof of the nside=512 ZA deposit on a sharded mesh.

A single v5e chip cannot run the nside=512 × 64-chi deposit (the scatter
warmup crashed the TPU worker — BASELINE.md "Deposit at nside=512");
the production answer is the chi-sharded deposit.  With the round-3
geometry-as-jit-args + vectors="arith" changes the sharded program's
tables fit any transport, and this tool EXECUTES it at nside=512 on an
8-virtual-device CPU mesh: the per-device slice program is exactly the
measured-safe single-chip slice size, the cross-shard mass rides the
halo ppermute, and mass conservation is asserted over the full cube.

Usage: python tools/sharded_deposit_512.py [--nside 512] [--nchi 16]
       [--devices 8] [--deposit stencil]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--nside", type=int, default=512)
p.add_argument("--nchi", type=int, default=16)
p.add_argument("--devices", type=int, default=8)
p.add_argument("--deposit", default="stencil", choices=["stencil", "scatter"])
args = p.parse_args()

import jax

print(f"# devices: {jax.device_count()} x {jax.devices()[0].platform}",
      file=sys.stderr)

from cora_tpu.ops import pmesh
from cora_tpu.parallel import lss as plss
from cora_tpu.parallel.mesh import make_mesh

nside, nchi = args.nside, args.nchi
npix = 12 * nside**2
chi = np.linspace(1800.0, 2000.0, nchi)
dchi = float(np.mean(np.diff(chi)))
rng = np.random.default_rng(5)

t0 = time.time()
geom = pmesh.sph_geometry(nside, device=False, vectors=False)
t_geom = time.time() - t0
print(f"# geometry tables (host, no nn_vec): {t_geom:.1f}s", file=sys.stderr)

# ZA-scale displacements (the tools/bench_stencil.py scales): radial
# sigma 0.2 bins keeps 5-sigma tails inside the halo-2 deposit window
# (the sharded contract POISONS on overflow rather than dropping mass)
res = 1.0 / nside
psi = np.stack([
    0.2 * dchi * rng.standard_normal((nchi, npix)),
    0.3 * res * rng.standard_normal((nchi, npix)),
    0.3 * res * rng.standard_normal((nchi, npix)),
]).astype(np.float32)
delta_b = (0.2 * rng.standard_normal((nchi, npix))).astype(np.float32)
delta_m = (0.2 * rng.standard_normal((nchi, npix))).astype(np.float32)

mesh = make_mesh(args.devices)
t0 = time.time()
out = np.asarray(
    plss.za_density_sph_sharded(
        psi, delta_b, delta_m, chi, nside, mesh, halo=2,
        deposit=args.deposit, vectors="arith", geometry=geom,
    )
)
t_run = time.time() - t0
finite = bool(np.isfinite(out).all())
# mass conservation: the deposit spreads (1 + delta_b) mass, output is
# density contrast over the SAME cube
mass_in = float((1.0 + delta_b).sum())
mass_out = float((1.0 + out).sum())
rel = abs(mass_out - mass_in) / mass_in
print(f"# deposit ({args.deposit}): {t_run:.1f}s wall, finite={finite}, "
      f"mass rel err {rel:.2e}", file=sys.stderr)
assert finite, "poisoned output — displacement exceeded the halo window"
assert rel < 1e-5, rel

print(json.dumps({
    "nside": nside, "nchi": nchi, "devices": args.devices,
    "deposit": args.deposit, "wall_s": round(t_run, 1),
    "geom_s": round(t_geom, 1), "mass_rel_err": rel, "finite": finite,
}))
