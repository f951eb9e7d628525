"""Hardware validation of the native SHT on the real TPU.

1. Map accuracy: synthesize a fixed alm on the TPU (cached-f32 Λ, matmul
   FFT, split ring mode — the production path) and compare to the exact
   CPU float64 scan-mode synthesis (which matches scipy's spherical
   harmonics to ~2e-14): reports RMS/max relative error
   (BASELINE.md target: ≤ 1e-5 RMS).
2. Round-trip: grid-layout analysis of the TPU map back to alm.
3. C_l recovery: anafast of a synthesized realisation against the input
   power spectrum, within cosmic-variance bands.

Writes results to tools/tpu_validate.out.  Run ALONE (single TPU client).
"""
import os
import sys
import json
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

import jax
import jax.numpy as jnp

if len(sys.argv) > 2:
    jax.config.update("jax_default_matmul_precision", sys.argv[2])

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 128
lmax = 3 * nside - 1
L = lmax + 1

from cora_tpu.healpix.sht import SHT, _synthesis_grid, _analysis_grid
from cora_tpu.util import xfer

rng = np.random.RandomState(0)
cl_in = 1.0 / (1.0 + np.arange(L)) ** 2

# fixed alm realisation on host (f64)
alm = np.zeros((L, L), dtype=np.complex128)
for l in range(1, L):
    s = np.sqrt(cl_in[l] / 2.0)
    alm[l, 0] = rng.randn() * np.sqrt(cl_in[l])
    alm[l, 1 : l + 1] = s * (rng.randn(l) + 1j * rng.randn(l))

res = {}

# --- TPU production synthesis (grid layout)
op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm",
         lambda_cache=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".bench_cache", f"lam_{nside}.npz"))
t = op.tables(False)
t0 = time.time()
g_tpu = np.asarray(
    jax.jit(lambda tt, a: _synthesis_grid(op, tt, a))(
        t, xfer.put(alm.astype(np.complex64))
    )
)
res["tpu_synth_s"] = round(time.time() - t0, 2)

# --- exact CPU reference (separate process would be cleaner; scan mode is
# pure f64 and runs fine on host CPU via jax cpu backend in THIS process?
# The axon plugin owns the platform; compute the reference with numpy
# instead: direct Legendre recurrence through the same host tables.
ref_op = SHT(nside, lmax, legendre_mode="cached", cache_dtype=np.float64,
             fft_mode="mm")

# host f64 synthesis: reuse the device program on CPU is not possible here
# (single platform); evaluate G = sum_l alm lam via the f64 host chunks and
# rings via numpy FFT-based chirp-z.
nh = op.nhalf
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
north_idx = np.minimum(np.arange(op.nring), nh - 1)
mirror = np.minimum(np.arange(op.nring), op.nring - 1 - np.arange(op.nring))
G = np.where((np.arange(op.nring) < nh)[:, None], Gn[north_idx], Gs[mirror])

# rings: exact DFT per ring (f64)
W = 4 * nside
info_nq = ref_op._nq
phi0 = ref_op._phi0
g_ref = np.zeros_like(g_tpu, dtype=np.float64)
m_arr = np.arange(L)
for r in range(op.nring):
    nq = int(info_nq[r])
    ph = np.exp(1j * m_arr * (phi0[r] + 2 * np.pi *
                np.arange(nq)[:, None] / nq))  # [nq, L]
    S = ph @ G[r]
    g_ref[r, :nq] = 2.0 * S.real - G[r, 0].real
res["map_rms_rel"] = float(
    np.sqrt(np.mean((g_tpu - g_ref) ** 2)) / np.sqrt(np.mean(g_ref**2))
)
res["map_max_rel"] = float(
    np.abs(g_tpu - g_ref).max() / np.abs(g_ref).max()
)

# --- analysis round-trip on TPU (grid layout)
print(json.dumps(res), flush=True)
t0 = time.time()
alm_rt = xfer.get(
    jax.jit(lambda tt, g: _analysis_grid(op, tt, g, 3))(
        t, xfer.put(g_tpu.astype(np.float32))
    )
)
res["tpu_analysis_s"] = round(time.time() - t0, 2)
num = np.linalg.norm(alm_rt[2:] - alm[2:].astype(np.complex64))
res["alm_roundtrip_rel"] = float(num / np.linalg.norm(alm[2:]))
nside_v = op.nside
band2n = slice(2, min(2 * nside_v, lmax) + 1)
num_b = np.linalg.norm(
    alm_rt[band2n] - alm[band2n].astype(np.complex64)
)
res["alm_roundtrip_rel_band2nside"] = float(
    num_b / np.linalg.norm(alm[band2n])
)

# --- C_l recovery from the round-tripped alm: per-ell chi^2 against
# exact cosmic variance ((2l+1) c_hat/C ~ chi^2_{2l+1}; VERDICT r1 #7)
w = np.ones(L)
w[1:] = 2.0
cl_hat = (np.abs(alm_rt) ** 2 * w[None, :]).sum(axis=1) / (
    2 * np.arange(L) + 1.0
)
band = slice(8, lmax // 2)
lb = np.arange(L)[band]
t_per = (2 * lb + 1) * cl_hat[band] / cl_in[band]
N = int((2 * lb + 1).sum())
res["cl_chi2"] = float(t_per.sum())
res["cl_chi2_dof"] = N
res["cl_chi2_z"] = float((t_per.sum() - N) / np.sqrt(2 * N))
z_l = (t_per - (2 * lb + 1)) / np.sqrt(2 * (2 * lb + 1.0))
res["cl_chi2_zl_max"] = float(np.abs(z_l).max())
res["cl_within_cosmic_variance"] = bool(
    abs(res["cl_chi2_z"]) < 5.0 and res["cl_chi2_zl_max"] < 5.5
)

print(json.dumps(res, indent=1))
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_validate.out"), "w") as f:
    json.dump(res, f, indent=1)
