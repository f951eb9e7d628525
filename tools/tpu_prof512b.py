"""Stage timing at the tuned flagship config, round 2 (split-plane path).

Times the production sub-programs of ``synthesis_scan_correlated`` at the
flagship config (Nside=512, 256 ch, fleg=128, fchunk=4, lchunk=256):

- draw-only:   _make_split_draw_blk blocks over all Λ chunks
- GeGo:        one level-1 sweep (draw + Legendre einsums, 128 freqs)
- rings:       one level-2 block (_expand_rings + _rings_to_grid, 4 freqs)
- full step:   the bench step (2 sweeps + 64 ring blocks)

Usage: python tools/tpu_prof512b.py   (run alone on the TPU; uses the
bench disk caches for roots/Λ).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

nside, nfreq, fleg, fchunk, lchunk = 512, 256, 128, 4, 256

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(root_dir, ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.healpix.sht import (  # noqa: E402
    SHT,
    _correlated_GeGo,
    _expand_rings,
    _join_planes,
    _make_split_draw_blk,
    _rings_to_grid,
    synthesis_scan_correlated,
)
from cora_tpu.util import xfer  # noqa: E402

lmax = 3 * nside - 1
L = lmax + 1

roots = np.load(os.path.join(cache_dir, f"roots_{nside}_{nfreq}.npy"))
t0 = time.time()
op = SHT(
    nside,
    lmax,
    legendre_mode="cached",
    fft_mode="mm",
    l_chunk=lchunk,
    lambda_cache=os.path.join(cache_dir, f"lam_{nside}_{lchunk}.npz"),
)
tabs = xfer.put_tree(op.tables(False))
roots_d = xfer.put(roots)
print(f"setup+transfer: {time.time()-t0:.1f}s", flush=True)


def timeit(name, fn, *args):
    t0 = time.time()
    s = float(fn(*args))
    print(f"{name} compile+run: {time.time()-t0:.1f}s (={s:.3e})", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        s = float(fn(*args))  # scalar fetch = execution barrier
        ts.append(time.time() - t0)
    print(f"{name} steady: {min(ts):.3f}s", flush=True)


def bench_key(i):
    return jax.random.key(i, impl="rbg")


@jax.jit
def draw_only(r, k, t):
    rp = jnp.concatenate([r[0::2], r[1::2]], axis=0)
    fn = _make_split_draw_blk(rp, k, 0, fleg, nfreq)
    ne = (L + 1) // 2
    acc = jnp.float32(0.0)
    for c, (parity, sub_lo, nrows, mw) in enumerate(op._lam_meta):
        off = sub_lo + (0 if parity == 0 else ne)
        acc = acc + jnp.sum(jnp.abs(fn(c, off, nrows, min(mw, L))))
    return acc


@jax.jit
def gego_sweep(r, k, t):
    rp = jnp.concatenate([r[0::2], r[1::2]], axis=0)
    Ge, Go = _correlated_GeGo(op, t, rp, k, 0, fleg)
    return jnp.sum(jnp.abs(Ge)) + jnp.sum(jnp.abs(Go))


@jax.jit
def rings_block(k, t):
    kr, ki = jax.random.split(k)
    nh = op.nhalf
    Ge = jax.lax.complex(
        jax.random.normal(kr, (fchunk, nh, L), jnp.float32),
        jax.random.normal(ki, (fchunk, nh, L), jnp.float32),
    )
    g = _rings_to_grid(op, t, _expand_rings(op, t, Ge, Ge * 0.5))
    return jnp.sum(jnp.abs(g))


@jax.jit
def full_step(k, r, t):
    return synthesis_scan_correlated(
        op, t, r, k, fleg, fchunk,
        lambda g, z, acc: acc + jnp.sum(jnp.abs(g)), jnp.float32(0.0),
    )


timeit("draw-only (1 sweep, 128f)", draw_only, roots_d, bench_key(0), tabs)
timeit("GeGo sweep (draw+legendre, 128f)", gego_sweep, roots_d, bench_key(0), tabs)
timeit("rings block (4f)", rings_block, bench_key(0), tabs)
timeit("full step (256f)", full_step, bench_key(0), roots_d, tabs)
print(
    "# step model: 2*GeGo + 64*rings; compare against full-step steady",
    flush=True,
)
