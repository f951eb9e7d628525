"""Matmul-precision ladder for the production SHT on the real TPU.

The deterministic transform contractions (Legendre einsums + matmul-FFT
twiddle products) pin ``precision="highest"`` — six bf16 passes per f32
matmul on TPU.  ``"high"`` (three passes) has ~2x the MXU throughput; if
its map error stays well under the 1e-5 RMS contract (BASELINE.md), the
MXU-bound stages of the step can run at the faster setting.

For each precision in {highest, high, default} this synthesizes the SAME
fixed alm realisation through the production path (cached-f32 Lambda,
matmul FFT, split+banded ring stage) and reports RMS/max relative map
error against the exact f64 host evaluation (the tpu_validate.py
reference: f64 Legendre chunks + per-ring exact DFT), plus the steady
synthesis time (k=4 in-jit iterations to amortize dispatch latency).

Usage: python tools/tpu_prec.py [nside]   (run ALONE on the TPU)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
import jax.numpy as jnp

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = 4
lmax = 3 * nside - 1
L = lmax + 1

root_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_dir = os.path.join(root_dir, ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(root_dir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cora_tpu.healpix.sht import SHT, _synthesis_grid  # noqa: E402
from cora_tpu.util import xfer  # noqa: E402

rng = np.random.RandomState(0)
cl_in = 1.0 / (1.0 + np.arange(L)) ** 2
alm = np.zeros((L, L), dtype=np.complex128)
for l in range(1, L):
    s = np.sqrt(cl_in[l] / 2.0)
    alm[l, 0] = rng.randn() * np.sqrt(cl_in[l])
    alm[l, 1 : l + 1] = s * (rng.randn(l) + 1j * rng.randn(l))

# --- exact f64 host reference through the f64 host Lambda chunks
ref_op = SHT(nside, lmax, legendre_mode="cached", cache_dtype=np.float64,
             fft_mode="mm")
nh = ref_op.nhalf
H0 = np.zeros((nh, L), dtype=np.complex128)
H1 = np.zeros_like(H0)
alm_p = np.concatenate([alm[0::2], alm[1::2]], axis=0)
ne = (L + 1) // 2
for (parity, sub_lo, nrows, _), chunk in zip(ref_op._lam_meta, ref_op._lam_host):
    mw = min(chunk.shape[-1], L)
    off = sub_lo + (0 if parity == 0 else ne)
    X = np.einsum("lrm,lm->rm", chunk[:nrows, :, :mw],
                  alm_p[off:off + nrows, :mw])
    if parity == 0:
        H0[:, :mw] += X
    else:
        H1[:, :mw] += X
meven = (np.arange(L)[None, :] % 2 == 0)
Ge = np.where(meven, H0, H1)
Go = np.where(meven, H1, H0)
Gn, Gs = Ge + Go, Ge - Go
north_idx = np.minimum(np.arange(ref_op.nring), nh - 1)
mirror = np.minimum(
    np.arange(ref_op.nring), ref_op.nring - 1 - np.arange(ref_op.nring)
)
G = np.where(
    (np.arange(ref_op.nring) < nh)[:, None], Gn[north_idx], Gs[mirror]
)
W = 4 * nside
m_arr = np.arange(L)
nq_max = int(ref_op._nq.max())
g_ref = np.zeros((ref_op.nring, nq_max), dtype=np.float64)
for r in range(ref_op.nring):
    nq = int(ref_op._nq[r])
    ph = np.exp(1j * m_arr * (ref_op._phi0[r]
                              + 2 * np.pi * np.arange(nq)[:, None] / nq))
    S = ph @ G[r]
    g_ref[r, :nq] = 2.0 * S.real - G[r, 0].real
rms_ref = np.sqrt(np.mean(g_ref**2))
print(f"# f64 reference done (nside={nside})", flush=True)

results = {}
for prec in ["highest", "high", "default"]:
    op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
             precision=prec,
             lambda_cache=os.path.join(cache_dir, f"lam_{nside}.npz"))
    t = xfer.put_tree(op.tables(False))
    a_d = xfer.put(alm.astype(np.complex64))

    @jax.jit
    def synth(tt, a):
        return _synthesis_grid(op, tt, a)

    @jax.jit
    def synth_loop(tt, a):
        def it(i, acc):
            # fresh scale per iteration so XLA cannot hoist the transform
            g = _synthesis_grid(op, tt, a * (1.0 + 1e-6 * i))
            return acc + jnp.sum(jnp.abs(g))
        return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))

    t0 = time.time()
    g = np.asarray(synth(t, a_d))
    compile_s = time.time() - t0
    err = g.astype(np.float64) - g_ref
    entry = {
        "map_rms_rel": float(np.sqrt(np.mean(err**2)) / rms_ref),
        "map_max_rel": float(np.abs(err).max() / np.abs(g_ref).max()),
        "compile_s": round(compile_s, 1),
    }
    float(synth_loop(t, a_d))  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(synth_loop(t, a_d))
        ts.append(time.time() - t0)
    entry["synth_s"] = round(min(ts) / K, 4)
    results[prec] = entry
    print(json.dumps({prec: entry}), flush=True)

out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tpu_prec.out")
with open(out, "w") as f:
    json.dump({"nside": nside, "results": results}, f, indent=1)
print(f"# written {out}", flush=True)
