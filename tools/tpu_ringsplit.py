"""Equatorial vs polar-cap time split of the ring stage (flagship config).

The ring stage (~72% of the 0.70 s flagship step, tools/tpu_prof512b.py)
has two halves: the Hermitian-packed equatorial IDFT (2·nside+1 rings of
length W) and the generalized Bluestein convolution over the polar caps
(2·(nside−1) rings, padded to nfft2).  This times each half standalone at
the production block shape [fchunk=4, ·, L] to decide where cap banding /
m-truncation would pay.

Because per-dispatch RPC overhead on the tunnelled runtime is ~20-40 ms,
each probe loops the target sub-program k=8 times inside one jit (fresh
phase per iteration so XLA cannot hoist), then divides.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

nside, fchunk, lchunk = 512, 4, 256
K = 8

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(root_dir, ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.healpix import sht as shtm  # noqa: E402
from cora_tpu.healpix.sht import SHT  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

lmax = 3 * nside - 1
L = lmax + 1

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
print(f"setup+transfer: {time.time()-t0:.1f}s", flush=True)

lo, hi = op._eq_lo, op._eq_hi
nh = op.nhalf


def timeit(name, fn, *args):
    t0 = time.time()
    s = float(fn(*args))
    print(f"{name} compile+run: {time.time()-t0:.1f}s (={s:.3e})", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name} steady: {min(ts)/K*1e3:.1f} ms/iter (k={K})", flush=True)


def loop(body):
    def run(k, t):
        def it(i, acc):
            kr, ki = jax.random.split(jax.random.fold_in(k, i))
            G = jax.lax.complex(
                jax.random.normal(kr, (fchunk, op.nring, L), jnp.float32),
                jax.random.normal(ki, (fchunk, op.nring, L), jnp.float32),
            )
            return acc + body(G, t)

        return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))

    return jax.jit(run)


@loop
def rng_only(G, t):
    return jnp.sum(jnp.abs(G))


@loop
def eq_only(G, t):
    cdtype = G.dtype
    W = 4 * op.nside
    A = G[..., lo:hi, :] * t["eq_phase"].astype(cdtype)
    Lp = A.shape[-1]
    if Lp % W:
        A = jnp.pad(A, [(0, 0)] * (A.ndim - 1) + [(0, W - Lp % W)])
    A = A.reshape(A.shape[:-1] + (-1, W)).sum(axis=-2)
    feq = shtm._eq_real_synth(op, t, A, G[..., lo:hi, 0:1].real)
    return jnp.sum(jnp.abs(feq))


@loop
def cap_only(G, t):
    Gcap = jnp.concatenate([G[..., :lo, :], G[..., hi:, :]], axis=-2)
    fcap = shtm._cap_sub_batched(op, shtm._cap_real_synth, t, Gcap)
    return jnp.sum(jnp.abs(fcap))


@loop
def cap_banded(G, t):
    Gcap = jnp.concatenate([G[..., :lo, :], G[..., hi:, :]], axis=-2)
    fcap = shtm._cap_sub_batched(op, shtm._cap_real_synth_banded, t, Gcap)
    return jnp.sum(jnp.abs(fcap))


@loop
def full_ring(G, t):
    g = shtm._rings_to_grid(op, t, G)
    return jnp.sum(jnp.abs(g))


key = jax.random.key(0, impl="rbg")
timeit("rng-only (baseline)", rng_only, key, tabs)
timeit("eq half", eq_only, key, tabs)
timeit("cap half (dense)", cap_only, key, tabs)
if op._cap_bands is not None:
    timeit("cap half (banded)", cap_banded, key, tabs)
timeit("full ring block", full_ring, key, tabs)
