"""Speed/accuracy of the ring-FFT matmul precision and cmul lowering.

The ring stage is MXU-pass-bound (tools/ring_profile.py: cap Bluestein
22.3 → 10.7 ms at nside=256 × 64 when the whole op drops to
precision="high"), but the precision knob was global; with the
`fft_precision` / `fft_cmul` options only the twiddle DFT matmuls change
while the Legendre contraction keeps "highest".  This probe measures, in
ONE process (axon box variance exceeds the effect otherwise):

  * synthesis ring-grid time for a [B, L, L] alm batch, per variant
  * grid accuracy vs an f64 CPU reference (max / rms relative)

Phases:
  python tools/fft_precision_probe.py --ref --nside 256      (CPU, once)
  python tools/fft_precision_probe.py --nside 256            (TPU)
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
p.add_argument("--batch", type=int, default=16)
p.add_argument("--reps", type=int, default=3)
p.add_argument("--ref", action="store_true", help="build f64 CPU reference")
p.add_argument("--cpu", action="store_true", help="run variants on CPU")
args = p.parse_args()

import jax

if args.ref or args.cpu:
    jax.config.update("jax_platforms", "cpu")
if args.ref:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from cora_tpu.healpix.sht import SHT, _synthesis_grid  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

nside = args.nside
lmax = 3 * nside - 1
L = lmax + 1
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(root, ".bench_cache")
os.makedirs(cache_dir, exist_ok=True)
ref_path = os.path.join(cache_dir, f"fftprec_ref_{nside}.npz")

rng = np.random.RandomState(7)
tri = np.arange(L)[None, None, :] <= np.arange(L)[None, :, None]
alm = (rng.randn(2, L, L) + 1j * rng.randn(2, L, L)) * tri
# red spectrum: realistic amplitude decay so rel-RMS is sky-like
alm *= ((1.0 + np.arange(L)) ** -1.0)[None, :, None]

if args.ref:
    t0 = time.time()
    op = SHT(nside, lmax, legendre_mode="cached", cache_dtype=np.float64,
             fft_mode="mm", l_chunk=64)
    g = np.asarray(_synthesis_grid(op, op.tables(True),
                                   jnp.asarray(alm.astype(np.complex128))))
    np.savez(ref_path, g=g)
    print(f"# f64 reference built in {time.time()-t0:.1f}s -> {ref_path}",
          file=sys.stderr)
    sys.exit(0)

print(f"# device: {jax.devices()[0]}", file=sys.stderr)
ref = np.load(ref_path)["g"] if os.path.exists(ref_path) else None
if ref is None:
    print("# no f64 reference (run --ref first); accuracy skipped",
          file=sys.stderr)

B = args.batch
almB = (rng.randn(B, L, L) + 1j * rng.randn(B, L, L)) * tri
almB = almB.astype(np.complex64)

variants = [
    ("highest/xla", dict(fft_precision="highest", fft_cmul="xla")),
    ("high/xla", dict(fft_precision="high", fft_cmul="xla")),
    ("highest/karatsuba", dict(fft_precision="highest", fft_cmul="karatsuba")),
    ("high/karatsuba", dict(fft_precision="high", fft_cmul="karatsuba")),
]

out = {}
for name, kw in variants:
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
             l_chunk=64, precision="highest", lambda_build="device",
             lambda_cache=os.path.join(cache_dir, f"lam_{nside}_64.npz"),
             **kw)
    t = xfer.put_tree(op.tables(False))
    fn = jax.jit(lambda a, tt, _op=op: _synthesis_grid(_op, tt, a))

    # accuracy on the reference alm
    acc = None
    if ref is not None:
        g = np.asarray(xfer.get(fn(xfer.put(alm.astype(np.complex64)), t)))
        scale = np.sqrt(np.mean(ref**2))
        acc = dict(
            rms=float(np.sqrt(np.mean((g - ref) ** 2)) / scale),
            mx=float(np.abs(g - ref).max() / scale),
        )

    aB = xfer.put(almB)
    t0 = time.time()
    float(jnp.sum(jnp.abs(fn(aB, t))))
    warm = time.time() - t0
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        float(jnp.sum(jnp.abs(fn(aB, t))))
        times.append(time.time() - t0)
    best = min(times)
    out[name] = dict(t=round(best, 4), warm=round(warm, 1), acc=acc)
    accs = (f" rms {acc['rms']:.2e} max {acc['mx']:.2e}" if acc else "")
    print(f"# {name:18s}: {best:.4f}s (warm {warm:.1f}s){accs}",
          file=sys.stderr)

print(json.dumps({"nside": nside, "batch": B, **out}))
