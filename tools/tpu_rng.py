"""RNG throughput probe on the real TPU: f32 vs bf16 normals, rbg impl.

The flagship draw stage is RNG-bound (~126 ms of the 0.573 s step,
tools/tpu_prof512b.py).  If 16-bit normal generation runs ~2x faster
(half the random bits per value) and the draw einsum accepts bf16 xi
without a slowdown, the step saves ~60 ms.  The xi quantization noise
(~0.3% per value, zero-mean) perturbs each realisation draw but not the
ensemble statistics contract (C_l recovery is chi^2-tested).

Times K=8 in-jit iterations of (a) normal(f32), (b) normal(bf16),
(c) the full draw einsum with f32 xi, (d) with bf16 xi.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8
nz = 256
nrows, mw = 128, 1536  # largest chunk shape of the flagship draw


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
    def run(k, r):
        def it(i, acc):
            return acc + body(jax.random.fold_in(k, i), r)

        return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))

    return jax.jit(run)


shape = (nrows, nz, 2, mw)


@loop
def rng_f32(k, r):
    xi = jax.random.normal(k, shape, jnp.float32)
    return jnp.sum(jnp.abs(xi[0, 0]))


@loop
def rng_bf16(k, r):
    xi = jax.random.normal(k, shape, jnp.bfloat16)
    return jnp.sum(jnp.abs(xi[0, 0]).astype(jnp.float32))


@loop
def draw_f32(k, r):
    xi = jax.random.normal(k, shape, jnp.float32)
    a = jnp.einsum("lzy,lypm->lzpm", r, xi)
    return jnp.sum(jnp.abs(a[0, 0, 0]))


@loop
def draw_bf16(k, r):
    xi = jax.random.normal(k, shape, jnp.bfloat16)
    a = jnp.einsum("lzy,lypm->lzpm", r, xi.astype(jnp.float32))
    return jnp.sum(jnp.abs(a[0, 0, 0]))


key = jax.random.key(0, impl="rbg")
roots = jnp.asarray(np.random.RandomState(0).randn(nrows, nz, nz), jnp.float32)
timeit("normal f32", rng_f32, key, roots)
timeit("normal bf16", rng_bf16, key, roots)
timeit("draw einsum, f32 xi", draw_f32, key, roots)
timeit("draw einsum, bf16 xi", draw_bf16, key, roots)
