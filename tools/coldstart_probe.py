"""Where does the flagship SHT setup time go, from a COLD compile cache?

BENCH_r02 showed 261 s of "SHT tables setup+transfer" before the 0.56 s
steps (VERDICT r2 weak #1).  The persistent jax compile cache cannot be
relied on across rounds — the driver's bench box is a different machine
from the build box (observed: XLA:CPU AOT cache entries refuse to load
across machines), so the honest target is cold-compile-cache setup time.

This probe times each phase separately:
  host __init__ (chirp/recurrence tables)  |  ck checkpoint load/build
  device-Λ builder: lower / compile / run  |  table transfer (xfer.put)

Usage:  python tools/coldstart_probe.py [--nside 512] [--lchunk 256]
        [--cache warm|cold]   (cold = fresh tmp compile-cache dir)
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

p = argparse.ArgumentParser()
p.add_argument("--nside", type=int, default=512)
p.add_argument("--nfreq", type=int, default=256)
p.add_argument("--lchunk", type=int, default=256)
p.add_argument("--cache", default="cold", choices=["cold", "warm"])
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

if args.cache == "cold":
    cache_dir = tempfile.mkdtemp(prefix="jaxcache_cold_")
else:
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
print(f"# compile cache: {args.cache} ({cache_dir})", flush=True)
print(f"# device: {jax.devices()[0]}", flush=True)

import numpy as np  # noqa: E402

from cora_tpu.healpix import sht as shtmod  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

nside, lchunk = args.nside, args.lchunk
lmax = 3 * nside - 1

bench_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", ".bench_cache")
ck_path = os.path.join(bench_cache, f"ck_{nside}_{lchunk}_1.npz")

t0 = time.time()
op = shtmod.SHT(
    nside, lmax, legendre_mode="cached", fft_mode="mm", l_chunk=lchunk,
    cap_sub=None, precision="highest", lambda_build="device",
    ckpt_cache=ck_path,
)
t_init = time.time() - t0
print(f"# SHT __init__ (host tables + ck load/build): {t_init:.1f}s",
      flush=True)

# --- device Λ builder: separate lower / compile / run ------------------
t0 = time.time()
lam = shtmod._build_lambda_device(op, np.float32)
jax.block_until_ready(lam)
t_build = time.time() - t0
print(f"# _build_lambda_device total (jit+run): {t_build:.1f}s", flush=True)

# run again — compile is cached in-process now, so this is pure execution
t0 = time.time()
lam2 = shtmod._build_lambda_device(op, np.float32)
jax.block_until_ready(lam2)
t_run = time.time() - t0
print(f"# _build_lambda_device re-run (warm jit): {t_run:.1f}s -> "
      f"compile ~{t_build - t_run:.1f}s", flush=True)
del lam2

# --- remaining table transfer ------------------------------------------
t0 = time.time()
t = op.tables(False)
jax.block_until_ready(t)
t_tab = time.time() - t0
print(f"# tables() (incl. 2nd Λ build path + xfer.put of host tables): "
      f"{t_tab:.1f}s", flush=True)

print(f"# TOTAL setup: {t_init + t_build + t_tab:.1f}s "
      f"(init {t_init:.1f} + Λ build {t_build:.1f} + tables {t_tab:.1f})",
      flush=True)
