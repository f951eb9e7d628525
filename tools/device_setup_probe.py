"""Probe the TPU primitives needed for a device-side C_l/roots setup path.

Decisions this feeds (VERDICT r3 items 1 & 5 — kill the cold start):
  a. DCT-I of (500, 32768) rows on device: rfft(2N-2=65534, non-pow2)
     vs tiled-matmul cosine projection — time + accuracy vs host f64.
  b. reverse cumtrapz twice along a 32768 axis (K-tilde build) in f32:
     does XLA's log-depth cumsum keep the error ~1e-6?
  c. batched eigh of [1536, 256, 256] f32 (covariance roots) — time, and
     reconstruction error ||R R^T - C|| / ||C||.
"""

import time
import sys

import numpy as np

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timed(fn, *a, n=2):
    out = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jax.block_until_ready(fn(*a))
        ts.append(time.time() - t0)
    return out, min(ts)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    rng = np.random.default_rng(0)

    # representative row content: smooth, decaying like P(k)*window
    nkperp, nkpar = 500, 32768
    kpar = np.linspace(0, 40.0, nkpar)
    kperp = np.logspace(-4, np.log10(20.0), nkperp)
    k = np.sqrt(kpar[None, :] ** 2 + kperp[:, None] ** 2)
    d64 = np.exp(-0.5 * k**2 / 25.0) * (k / (1e-4 + k**4 / 10.0) ** 0.5)
    import scipy.fft

    t0 = time.time()
    ref = scipy.fft.dct(d64, type=1)
    log(f"host f64 dct reference: {time.time()-t0:.2f}s")

    d32 = jnp.asarray(d64, jnp.float32)

    # --- a1: rfft-based DCT-I --------------------------------------------
    def dct1_fft(x):
        ext = jnp.concatenate([x, x[:, -2:0:-1]], axis=-1)  # 2N-2 = 65534
        return jnp.fft.rfft(ext).real

    try:
        out, dt = timed(jax.jit(dct1_fft), d32)
        err = np.abs(np.asarray(out, np.float64) - ref)
        rel = err.max() / np.abs(ref).max()
        rowrel = (err.max(axis=1) / np.abs(ref).max(axis=1)).max()
        log(f"a1 rfft DCT-I: {dt*1e3:.1f} ms, maxabs-rel {rel:.2e}, "
            f"worst row-rel {rowrel:.2e}")
    except Exception as e:
        log(f"a1 rfft DCT-I FAILED: {type(e).__name__}: {e}")

    # --- a2: tiled-matmul DCT-I ------------------------------------------
    def dct1_mm(x, tile=2048):
        n = x.shape[-1]
        i = jnp.arange(n, dtype=jnp.float32)
        # DCT-I weights: ends count once, interior twice
        w = jnp.ones((n,), jnp.float32).at[1:-1].set(2.0)
        xw = x * w

        def body(c, jt):
            j = jt * tile + jnp.arange(tile, dtype=jnp.float32)
            C = jnp.cos(jnp.pi / (n - 1) * i[:, None] * j[None, :])
            return c, jnp.einsum(
                "rn,nt->rt", xw, C, precision=jax.lax.Precision.HIGHEST
            )

        _, outs = jax.lax.scan(body, 0, jnp.arange(n // tile))
        return jnp.moveaxis(outs, 0, 1).reshape(x.shape[0], n)

    try:
        out, dt = timed(jax.jit(dct1_mm), d32)
        err = np.abs(np.asarray(out, np.float64) - ref)
        rel = err.max() / np.abs(ref).max()
        rowrel = (err.max(axis=1) / np.abs(ref).max(axis=1)).max()
        log(f"a2 matmul DCT-I: {dt*1e3:.1f} ms, maxabs-rel {rel:.2e}, "
            f"worst row-rel {rowrel:.2e}")
    except Exception as e:
        log(f"a2 matmul DCT-I FAILED: {type(e).__name__}: {e}")

    # cos argument accuracy: pi/(n-1)*i*j up to pi*32767 — f32 cos of a
    # large argument loses ~arg*eps ~ 6e-3 rad phase!  a2b: reduce i*j mod
    # 2(n-1) in integer space first (exact), then cos of a small arg.
    def dct1_mm_mod(x, tile=2048):
        n = x.shape[-1]
        ii = jnp.arange(n, dtype=jnp.int64)
        w = jnp.ones((n,), jnp.float32).at[1:-1].set(2.0)
        xw = x * w

        def body(c, jt):
            j = jt * tile + jnp.arange(tile, dtype=jnp.int64)
            ij = (ii[:, None] * j[None, :]) % (2 * (n - 1))
            C = jnp.cos(
                (jnp.pi / (n - 1)) * ij.astype(jnp.float32)
            )
            return c, jnp.einsum(
                "rn,nt->rt", xw, C, precision=jax.lax.Precision.HIGHEST
            )

        _, outs = jax.lax.scan(body, 0, jnp.arange(n // tile))
        return jnp.moveaxis(outs, 0, 1).reshape(x.shape[0], n)

    try:
        out, dt = timed(jax.jit(dct1_mm_mod), d32)
        err = np.abs(np.asarray(out, np.float64) - ref)
        rel = err.max() / np.abs(ref).max()
        rowrel = (err.max(axis=1) / np.abs(ref).max(axis=1)).max()
        log(f"a2b matmul DCT-I (mod-reduced phase): {dt*1e3:.1f} ms, "
            f"maxabs-rel {rel:.2e}, worst row-rel {rowrel:.2e}")
    except Exception as e:
        log(f"a2b matmul DCT-I FAILED: {type(e).__name__}: {e}")

    # --- b: double reverse cumtrapz in f32 --------------------------------
    dr = np.pi / 40.0
    I64 = ref  # use the DCT output as the integrand, like the real build
    T64 = np.concatenate(
        [np.cumsum((0.5 * dr * (I64[:, 1:] + I64[:, :-1]))[:, ::-1],
                   axis=-1)[:, ::-1], np.zeros((nkperp, 1))], axis=-1)
    K64 = np.concatenate(
        [np.cumsum((0.5 * dr * (T64[:, 1:] + T64[:, :-1]))[:, ::-1],
                   axis=-1)[:, ::-1], np.zeros((nkperp, 1))], axis=-1)

    def rev2(I):
        def rc(a):
            inc = 0.5 * np.float32(dr) * (a[:, 1:] + a[:, :-1])
            c = jnp.cumsum(inc[:, ::-1], axis=-1)[:, ::-1]
            return jnp.pad(c, ((0, 0), (0, 1)))
        return rc(rc(I))

    out, dt = timed(jax.jit(rev2), jnp.asarray(I64, jnp.float32))
    err = np.abs(np.asarray(out, np.float64) - K64)
    rel = err.max() / np.abs(K64).max()
    log(f"b  double rev-cumtrapz f32: {dt*1e3:.1f} ms, rel-vs-max {rel:.2e}")

    # --- c: batched f32 eigh ----------------------------------------------
    L, nz = 1536, 256
    A = rng.standard_normal((L, nz, 24))
    C = (A @ A.transpose(0, 2, 1)).astype(np.float32)  # rank-deficient PSD
    C += 1e-12 * np.eye(nz, dtype=np.float32)
    Cd = jnp.asarray(C)

    @jax.jit
    def roots(Cb):
        ev, Q = jnp.linalg.eigh(Cb)
        ev = jnp.where(ev > ev.max(axis=-1, keepdims=True) * 1e-7, ev, 0.0)
        return Q * jnp.sqrt(ev)[:, None, :]

    try:
        R, dt = timed(roots, Cd, n=1)
        R = np.asarray(R, np.float64)
        rec = np.einsum("lij,lkj->lik", R, R)
        rel = np.abs(rec - C.astype(np.float64)).max() / np.abs(C).max()
        log(f"c  batched eigh [{L},{nz},{nz}] f32: {dt:.2f} s, "
            f"||RR^T - C||_inf / ||C||_inf = {rel:.2e}")
    except Exception as e:
        log(f"c  batched eigh FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
