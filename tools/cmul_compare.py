"""Same-process head-to-head: fft_cmul / fft_precision on the full step.

tools/ring_profile.py's cumulative-subtraction runs disagree across
processes (axon box variance on the draw+Legendre base is ~±20%, and the
cap-only karatsuba sub-program compiled pathologically slow while the
full program did not), so this times ONLY full streamed-synthesis steps,
all variants in one process, same roots/key.

Usage: python tools/cmul_compare.py [--nside 256] [--nfreq 64] ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--nside", type=int, default=256)
p.add_argument("--nfreq", type=int, default=64)
p.add_argument("--fchunk", type=int, default=32)
p.add_argument("--fleg", type=int, default=64)
p.add_argument("--lchunk", type=int, default=64)
p.add_argument("--reps", type=int, default=5)
p.add_argument("--variants", default="xla,karatsuba,high",
               help="comma list from {xla, karatsuba, high}")
p.add_argument("--capbands", default=None,
               help="comma list of cap_bands values to sweep (with the "
                    "first variant's cmul settings)")
p.add_argument("--convmodes", default=None,
               help="comma list of conv_mode values to sweep "
                    "({fused, twostep}; with the first variant's cmul "
                    "settings — table layouts differ, so device tables "
                    "are rebuilt per variant)")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax
import jax.numpy as jnp

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from cora_tpu.healpix.sht import SHT, synthesis_scan_correlated
from cora_tpu.util import xfer

nside, nfreq = args.nside, args.nfreq
lmax = 3 * nside - 1
print(f"# device: {jax.devices()[0]}", file=sys.stderr)

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache",
)
roots_path = os.path.join(cache_dir, f"roots_{nside}_{nfreq}.npy")
if os.path.exists(roots_path):
    roots = np.load(roots_path)
else:
    rng = np.random.default_rng(0)
    a = rng.standard_normal((lmax + 1, nfreq, nfreq)).astype(np.float32)
    roots = np.tril(a) * 1e-3
roots_d = xfer.put(roots)

_ALL = {
    "xla": ("xla/highest", dict(fft_cmul="xla")),
    "karatsuba": ("karatsuba/highest", dict(fft_cmul="karatsuba")),
    "high": ("xla/high", dict(fft_cmul="xla", fft_precision="high")),
}
variants = [_ALL[v] for v in args.variants.split(",")]
if args.capbands:
    base = variants[0][1]
    variants = [
        (f"{variants[0][0]}/cb{cb}", dict(base, cap_bands=int(cb)))
        for cb in args.capbands.split(",")
    ]
if args.convmodes:
    # cross product with whatever came before (base variant or the
    # --capbands sweep), so combined sweeps are honoured rather than
    # silently collapsed to variants[0]
    variants = [
        (f"{name}/{cm}", dict(base, conv_mode=cm))
        for name, base in variants
        for cm in args.convmodes.split(",")
    ]

out = {}
t_shared = None
for name, kw in variants:
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
             l_chunk=args.lchunk, precision="highest",
             lambda_build="device",
             lambda_cache=os.path.join(cache_dir, f"lam_{nside}_{args.lchunk}.npz"),
             **kw)
    # device tables are pure functions of (nside, lmax, l_chunk, banding)
    # — identical across cmul/precision variants; build once and share
    # (a second per-variant copy OOMs HBM at nside=512: multi-GB Λ)
    if t_shared is None or args.capbands or args.convmodes:
        t_shared = xfer.put_tree(op.tables(False))
    t = t_shared

    def _one(key, r, tt, _op=op):
        return synthesis_scan_correlated(
            _op, tt, r, key, args.fleg, args.fchunk,
            lambda g, z, acc: acc + jnp.sum(jnp.abs(g)), jnp.float32(0.0),
        )

    fn = jax.jit(_one)
    key = jax.random.key(0, impl="rbg")
    t0 = time.time()
    s = float(fn(key, roots_d, t))
    warm = time.time() - t0
    times = []
    for i in range(args.reps):
        k = jax.random.key(i + 1, impl="rbg")
        t0 = time.time()
        float(fn(k, roots_d, t))
        times.append(time.time() - t0)
    best = min(times)
    out[name] = round(best, 4)
    print(f"# {name:20s}: {best:.4f}s (warm {warm:.1f}s, sum {s:.4e})",
          file=sys.stderr)
    # drop this variant's compiled executable (its temporaries can pin
    # HBM on this backend) before the next one compiles
    import gc

    del fn
    if args.capbands or args.convmodes:
        # the op instance caches its device tables (SHT._dev_tables) —
        # multi-GB Λ at nside=512; drop them before the next variant's
        # transfer or it OOMs HBM
        t_shared = None
        del t
        op._dev_tables.clear()
        del op
    jax.clear_caches()
    gc.collect()

print(json.dumps({"nside": nside, "nfreq": nfreq, **out}))
