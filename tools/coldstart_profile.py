"""Profile the SHT host-side setup phases (init / tables) with cProfile.

Companion to coldstart_probe.py: that told us WHERE the wall-clock goes
(init 52.5 s / Λ-build compile 93.5 s / tables 42.6 s at nside=512 from a
cold compile cache); this tells us WHAT inside init and tables() burns it.
"""

import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

cache_dir = tempfile.mkdtemp(prefix="jaxcache_cold_")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print(f"# device: {jax.devices()[0]}", flush=True)

import numpy as np  # noqa: E402

from cora_tpu.healpix import sht as shtmod  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

nside, lchunk = 512, 256
lmax = 3 * nside - 1
bench_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", ".bench_cache")
ck_path = os.path.join(bench_cache, f"ck_{nside}_{lchunk}_1.npz")
print(f"# ck cache present: {os.path.exists(ck_path)}", flush=True)


def profiled(label, fn):
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    out = fn()
    pr.disable()
    print(f"\n##### {label}: {time.time()-t0:.1f}s", flush=True)
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue(), flush=True)
    return out


op = profiled("SHT __init__", lambda: shtmod.SHT(
    nside, lmax, legendre_mode="cached", fft_mode="mm", l_chunk=lchunk,
    cap_sub=None, precision="highest", lambda_build="device",
    ckpt_cache=ck_path,
))

t = profiled("tables(False)", lambda: op.tables(False))
jax.block_until_ready(t)

# table sizes: what actually crosses the wire
print("\n##### table leaf sizes (MB):", flush=True)
tot = 0
for k, v in sorted(t.items(), key=lambda kv: -kv[1].nbytes):
    mb = v.nbytes / 1e6
    tot += mb
    if mb > 1:
        print(f"  {k}: {mb:.1f} MB  {v.shape} {v.dtype}", flush=True)
print(f"  TOTAL {tot:.1f} MB", flush=True)
