"""Stage split of the ZA SPH density step on the v5e.

Times (a) the full per-slice update, (b) weights-only (scatter replaced
by a checksum), (c) the scatter-add alone on precomputed weights —
deciding whether the 2.4 Mparticles/s bottleneck (tools/bench_za.py) is
the XLA scatter or the weight/gather stage.

Usage: python tools/tpu_za_prof.py [--nside 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--nside", type=int, default=256)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.ops import pmesh  # noqa: E402
from cora_tpu.healpix import pixel as hpx  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

nside = args.nside
npix = hpx.nside2npix(nside)
nchi = 4
print(f"# device: {jax.devices()[0]} npix={npix}", file=sys.stderr)

rng = np.random.RandomState(0)
geom = pmesh.sph_geometry(nside)
chi = jnp.asarray(np.linspace(1500.0, 1600.0, nchi))
K = 8  # in-program iterations to amortize dispatch


def timeit(fn):
    jax.block_until_ready(fn())  # warmup / compile
    t0 = time.time()
    jax.block_until_ready(fn())
    return (time.time() - t0) / K


# representative inputs for ONE slice
psi = xfer.put(rng.standard_normal((3, npix)).astype(np.float32) * 0.004)
db = xfer.put(rng.standard_normal(npix).astype(np.float32) * 0.3)
dm = xfer.put(rng.standard_normal(npix).astype(np.float32) * 0.3)
sigma_ang = hpx.nside2resol(nside) / 2
sigma_chi = float(np.mean(np.abs(np.diff(np.asarray(chi)))) / 2)


@jax.jit
def weights_only(psi, db, dm):
    acc = jnp.float32(0.0)
    outs = []
    for i in range(K):
        density = 1.0 + db + 1e-6 * i
        scaling = jnp.clip(1.0 + dm, 0.1, 3.0) ** (-1.0 / 3)
        new_ang = pmesh.calculate_positions(
            geom["angpos"], jnp.stack([psi[1], psi[2]]) * (1 + 1e-6 * i))
        new_chi = chi[1] + psi[0]
        new_ang_ind = pmesh._ang2pix_jax(nside, new_ang[0], new_ang[1])
        st = jnp.sin(new_ang[0])
        vec = jnp.stack([st * jnp.cos(new_ang[1]),
                         st * jnp.sin(new_ang[1]), jnp.cos(new_ang[0])], -1)
        pix_i, pix_w = pmesh.pixel_weights(
            new_ang_ind, vec, scaling, sigma_ang, geom["nn_ind"], geom["nn_vec"])
        chi_ind = jnp.searchsorted(chi, new_chi)
        rad_i, rad_w = pmesh.radial_weights(chi_ind, new_chi, scaling, sigma_chi, 1, chi)
        acc = acc + jnp.sum(pix_w * density[:, None]) + jnp.sum(rad_w) \
            + jnp.sum(pix_i) + jnp.sum(rad_i)
        outs.append((density, pix_i, pix_w, rad_i, rad_w))
    return acc, outs[0]


@jax.jit
def scatter_only(density, pix_i, pix_w, rad_i, rad_w):
    out = jnp.zeros((nchi, npix), jnp.float32)
    for i in range(K):
        out = pmesh.bin_delta(density + 1e-6 * i, pix_i, pix_w, rad_i, rad_w, out)
    return out


@jax.jit
def full(psi, db, dm):
    out = jnp.zeros((nchi, npix), jnp.float32)
    acc, (density, pix_i, pix_w, rad_i, rad_w) = weights_only(psi, db, dm)
    for i in range(K):
        out = pmesh.bin_delta(density + 1e-6 * i, pix_i, pix_w, rad_i, rad_w, out)
    return out + acc


t_w = timeit(lambda: weights_only(psi, db, dm))
print(f"weights-only: {t_w*1e3:.1f} ms/slice")

_, (density, pix_i, pix_w, rad_i, rad_w) = jax.block_until_ready(
    weights_only(psi, db, dm))
t_s = timeit(lambda: scatter_only(density, pix_i, pix_w, rad_i, rad_w))
print(f"scatter-only: {t_s*1e3:.1f} ms/slice "
      f"({npix*27/t_s/1e6:.0f} M scatter-adds/s)")

t_f = timeit(lambda: full(psi, db, dm))
print(f"full slice:   {t_f*1e3:.1f} ms/slice")
