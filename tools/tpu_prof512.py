"""Stage timing at the flagship config (uses bench disk caches).

Usage: python tools/tpu_prof512.py [nside nfreq fchunk]
Times (per freq-chunk, steady state): draw+legendre only, rings only,
full fused step. One process — run alone on the TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 512
nfreq = int(sys.argv[2]) if len(sys.argv) > 2 else 256
fchunk = int(sys.argv[3]) if len(sys.argv) > 3 else 16

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(cache_dir), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.healpix.sht import (
    SHT, _legendre_contract_streamed, _rings_to_grid, synthesis_grid_correlated,
)
from cora_tpu.util import xfer

lmax = 3 * nside - 1
L = lmax + 1

roots = np.load(os.path.join(cache_dir, f"roots_{nside}_{nfreq}.npy"))
t0 = time.time()
op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
         lambda_cache=os.path.join(cache_dir, f"lam_{nside}.npz"))
tabs = op.tables(False)
roots_d = xfer.put(roots)
print(f"setup+transfer: {time.time()-t0:.1f}s", flush=True)


def timeit(name, fn, *args):
    t0 = time.time()
    s = float(fn(*args))
    print(f"{name} compile+run: {time.time()-t0:.1f}s (={s:.3e})", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        s = float(fn(*args))  # scalar fetch = real execution barrier here
        ts.append(time.time() - t0)
    print(f"{name} steady: {min(ts):.3f}s", flush=True)


key = jax.random.PRNGKey(0)


def alm_blk_maker(rp, k, z_lo):
    # rp: parity-packed roots [L, nz, nz] (evens first), matching _lam_meta
    def alm_blk(c, off, nrows, mw):
        kc = jax.random.fold_in(k, c)
        kr, ki = jax.random.split(kc)
        xi = (jax.random.normal(kr, (nrows, nfreq, mw), jnp.float32)
              + 1j * jax.random.normal(ki, (nrows, nfreq, mw), jnp.float32)) * 0.70710678
        rblk = jax.lax.dynamic_slice(rp, (off, z_lo, 0), (nrows, fchunk, nfreq)).astype(jnp.complex64)
        a = jnp.einsum("lzy,lym->lzm", rblk, xi)
        return jnp.moveaxis(a, 0, 1)
    return alm_blk


@jax.jit
def leg_only(r, k, t):
    rp = jnp.concatenate([r[0::2], r[1::2]], axis=0)
    G = _legendre_contract_streamed(op, t, alm_blk_maker(rp, k, 0), (fchunk,), jnp.complex64)
    return jnp.sum(jnp.abs(G))


@jax.jit
def draw_only(r, k, t):
    rp = jnp.concatenate([r[0::2], r[1::2]], axis=0)
    fn = alm_blk_maker(rp, k, 0)
    ne = (L + 1) // 2
    acc = jnp.float32(0.0)
    for c, (parity, sub_lo, nrows, mw) in enumerate(op._lam_meta):
        off = sub_lo + (0 if parity == 0 else ne)
        acc = acc + jnp.sum(jnp.abs(fn(c, off, nrows, min(mw, L))))
    return acc


@jax.jit
def rings_only(k, t):
    kr, ki = jax.random.split(k)
    G = (jax.random.normal(kr, (fchunk, op.nring, L), jnp.float32)
         + 1j * jax.random.normal(ki, (fchunk, op.nring, L), jnp.float32))
    g = _rings_to_grid(op, t, G.astype(jnp.complex64))
    return jnp.sum(jnp.abs(g))


@jax.jit
def full_chunk(r, k, t):
    g = synthesis_grid_correlated(op, t, r, k, 0, fchunk)
    return jnp.sum(jnp.abs(g))


timeit("draw(1 chunk)", draw_only, roots_d, key, tabs)
timeit("legendre(1 chunk, incl draw)", leg_only, roots_d, key, tabs)
timeit("rings(1 chunk)", rings_only, key, tabs)
timeit("full(1 chunk)", full_chunk, roots_d, key, tabs)
