"""Phase breakdown of ConstrainedGalaxy.getpolsky (cold and steady).

BASELINE.md records the polarised galaxy path at ~100-137 s process-cold
with "high box variance" and 49 s steady; this tool attributes the cold
wall to its phases so the dominant one can be attacked:

  init       — skydata load + __init__ model-device smoothing
  getsky     — unpolarised constrained base (clarray + mkfullsky +
               mkconstrained + smoothings)
  sigma_phi  — Faraday window widths (device smoothing pair)
  sht_setup  — get_sht + tables for the screen synthesis
  screen     — _faraday_screen_device first call (compile + run)
  assemble   — grid→pixel reorder + Stokes-I modulation + g→c rotation
  steady     — second full getpolsky in-process

Usage: python tools/galaxy_profile.py [--nside 128] [--nfreq 64] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--nside", type=int, default=128)
p.add_argument("--nfreq", type=int, default=64)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print(f"# device: {jax.devices()[0]}", file=sys.stderr)

from cora_tpu.foreground import galaxy as G  # noqa: E402

times = {}


def mark(name, t0):
    times[name] = round(time.time() - t0, 2)
    print(f"# {name:10s}: {times[name]:.2f}s", file=sys.stderr)


freqs = np.linspace(400.0, 800.0, args.nfreq, endpoint=False)

t0 = time.time()
gal = G.ConstrainedGalaxy()
gal.nside = args.nside
gal.frequencies = freqs
mark("init", t0)

key = jax.random.PRNGKey(17)
kI, kP = jax.random.split(key)

t0 = time.time()
sky_I = gal.getsky(celestial=False, key=kI)
mark("getsky", t0)

t0 = time.time()
gal._sigma_phi()
mark("sigma_phi", t0)

# --- screen phases, mirroring getpolsky's internals ---------------------
from cora_tpu.healpix import pixel as hpx  # noqa: E402
from cora_tpu.healpix import sht as _sht  # noqa: E402
from cora_tpu.util.compute import accel_device  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

sigma_phi = gal._sigma_phi()
lmax = 3 * gal.nside - 1
la = np.arange(lmax + 1, dtype=np.float64)
safe = np.where(la == 0, 1.0e16, la)
ps_weight = ((safe / 100.0) ** -2.8 / 2.0) ** 0.5
dphi, maxphi = gal._dphi, gal._maxphi
nphi = 2 * int(maxphi / dphi)
phifreq = np.fft.fftfreq(nphi, d=(1.0 / (dphi * nphi)))
pcfreq = np.fft.fftfreq(nphi, d=dphi)
corr_w = np.exp(-2 * (np.pi * 1.0 * pcfreq) ** 2)
npix = 12 * gal.nside**2
info = hpx.ring_info(gal.nside)
nring = info["nphi"].size
W = int(info["nphi"].max())
r_of = np.repeat(np.arange(nring), info["nphi"])
j_of = np.arange(npix) - info["start"][r_of]
sig_grid = np.ones((nring, W), dtype=np.float32)
sig_grid[r_of, j_of] = sigma_phi


def ptrans(phi, freq, dfreq):
    dx = dfreq / freq
    alpha = 2.0 * phi * 3e2**2 / freq**2
    return np.exp(1.0j * alpha) * np.sinc(alpha * dx / np.pi)


fa = gal.nu_pixels
df = np.median(np.diff(fa))
pta = ptrans(phifreq[:, None], fa[None, :], df) / dphi

with accel_device():
    t0 = time.time()
    op = _sht.get_sht(gal.nside, lmax)
    t = op.tables(False)
    mark("sht_setup", t0)

    t0 = time.time()
    qu_re, qu_im = G._faraday_screen_device(
        op, t, kP, ps_weight, nphi, corr_w, sig_grid, phifreq, pta
    )
    qu_re = np.asarray(xfer.get(qu_re))
    qu_im = np.asarray(xfer.get(qu_im))
    mark("screen", t0)

from cora_tpu import native  # noqa: E402
from cora_tpu.healpix import transforms as hputil  # noqa: E402

t0 = time.time()
start64 = info["start"].astype(np.int64)
nphi64 = info["nphi"].astype(np.int64)
map4_re = native.grid_to_pixels(qu_re, start64, nphi64, npix)
map4_im = native.grid_to_pixels(qu_im, start64, nphi64, npix)
map5 = np.zeros((gal.nu_num, 4, npix), dtype=np.float64)
map5[:, 0] = sky_I
map5[:, 1] = map4_re
map5[:, 2] = map4_im
map5[:, 1:3] *= map5[:, 0, np.newaxis, :]
map5 = hputil.coord_g2c(map5)
mark("assemble", t0)

cold_total = sum(times.values())
print(f"# cold total: {cold_total:.2f}s", file=sys.stderr)

t0 = time.time()
m2 = gal.getpolsky(key=jax.random.PRNGKey(18))
mark("steady", t0)
assert np.isfinite(m2).all()

print(json.dumps({"nside": args.nside, "nfreq": args.nfreq, **times,
                  "cold_total": round(cold_total, 2)}))
