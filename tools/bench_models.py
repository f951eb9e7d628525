"""Model-path benchmarks on the real TPU: the non-flagship entry points.

bench.py times the flagship scalar synthesis step; this tool times the
other production paths end-to-end (wall time incl. host stages — the
honest number a user sees), at sizes the reference runs through healpy
loops on a CPU:

* 21cm polarised cube (spin-2 wrapper; reference maps.py:239 getpolsky)
* ConstrainedGalaxy getpolsky — the reference's slowest path: its Faraday
  screen loops nphi=64..1000 complex inverse SHTs through healpy
  (reference galaxy.py:260-267); here it is one batched device synthesis
* CombinedPointSources getpolsky (population draw + painting + faraday)
* Zel'dovich SPH density step (see also tools/bench_za.py for the jitted
  steady-state step; here the end-to-end task)

Usage: python tools/bench_models.py [--nside 128] [--nfreq 64] [--cpu]
       [--which pol,galaxy,ps]
Writes one JSON line per path.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--nside", type=int, default=128)
p.add_argument("--nfreq", type=int, default=64)
p.add_argument("--cpu", action="store_true")
p.add_argument("--which", default="pol,galaxy,ps")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

which = set(args.which.split(","))
freqs = np.linspace(400.0, 800.0, args.nfreq, endpoint=False)
dev = jax.devices()[0]
print(f"# device: {dev.device_kind}", file=sys.stderr)


def emit(name, seconds, shape):
    print(json.dumps({
        "metric": name,
        "value": round(seconds, 3),
        "unit": "s",
        "nside": args.nside,
        "nfreq": args.nfreq,
        "shape": list(shape),
    }), flush=True)


if "pol" in which:
    from cora_tpu.signal.corr21cm import Corr21cm

    cr = Corr21cm()
    cr.nside = args.nside
    cr.frequencies = freqs
    t0 = time.time()
    m = cr.getpolsky()
    emit("21cm polarised cube (getpolsky, end-to-end)", time.time() - t0,
         np.asarray(m).shape)

if "galaxy" in which:
    from cora_tpu.foreground.galaxy import ConstrainedGalaxy

    gal = ConstrainedGalaxy()
    gal.nside = args.nside
    gal.frequencies = freqs
    t0 = time.time()
    m = gal.getsky()
    emit("galaxy unpolarised (getsky, constrained)", time.time() - t0,
         np.asarray(m).shape)
    t0 = time.time()
    m = gal.getpolsky()
    emit("galaxy polarised (getpolsky, Faraday screen)", time.time() - t0,
         np.asarray(m).shape)

if "ps" in which:
    from cora_tpu.foreground.pointsource import CombinedPointSources

    ps = CombinedPointSources()
    ps.nside = args.nside
    ps.frequencies = freqs
    t0 = time.time()
    m = ps.getpolsky()
    emit("point sources (getpolsky, 3-regime composite)", time.time() - t0,
         np.asarray(m).shape)
