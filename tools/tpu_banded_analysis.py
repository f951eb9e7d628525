"""Device (TPU) banded-analysis measurement, grid layout, split jits."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from cora_tpu.healpix.sht import (
    SHT, _synthesis_grid, _analysis_cg_grid, _analysis_grid,
)
from cora_tpu.util import xfer

nside = int(sys.argv[1]) if len(sys.argv) > 1 else 128
niter = int(sys.argv[2]) if len(sys.argv) > 2 else 10
lmaxF = 3 * nside - 1
L2 = 2 * nside
Lf = lmaxF + 1
bc = "/root/repo/.bench_cache"

rng = np.random.default_rng(7)
li = np.arange(Lf)[:, None]; mi = np.arange(Lf)[None, :]
a = (rng.standard_normal((Lf, Lf)) + 1j*rng.standard_normal((Lf, Lf))) * np.sqrt(0.5)
a[:, 0] = rng.standard_normal(Lf)
alm = np.where((mi <= li) & (li <= L2), a, 0.0).astype(np.complex64)
scale = np.abs(alm).max()

opF = SHT(nside, lmaxF, legendre_mode="cached", fft_mode="mm",
          lambda_cache=os.path.join(bc, f"lam_{nside}.npz"))
tF = opF.tables(False)
t0 = time.time()
g = jax.jit(lambda tt, x: _synthesis_grid(opF, tt, x))(tF, xfer.put(alm))
g.block_until_ready()
print(f"# synthesis grid: {time.time()-t0:.1f}s", flush=True)
g32 = xfer.put(np.asarray(xfer.get(g)).astype(np.float32))
band = (li <= L2) & (mi <= li)

opB = SHT(nside, L2, legendre_mode="cached", fft_mode="mm",
          lambda_cache=os.path.join(bc, f"lam_{nside}_b2n.npz"))
tB = opB.tables(False)

t0 = time.time()
ab = jax.block_until_ready(jax.jit(
    lambda tt, g: _analysis_cg_grid(opB, tt, g, niter))(tB, g32))
print(f"# banded CG({niter}) lmax=2ns: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
resid = jax.block_until_ready(jax.jit(
    lambda tt, g, x: g - _synthesis_grid(opB, tt, x))(tB, g32, ab))
af = jax.block_until_ready(jax.jit(
    lambda tt, r: _analysis_grid(opF, tt, r, 0))(tF, resid))
print(f"# corner completion: {time.time()-t0:.1f}s", flush=True)

rec = np.pad(np.asarray(xfer.get(ab)), [(0, Lf-L2-1), (0, Lf-L2-1)])
af = np.asarray(xfer.get(af))
rec[L2+1:] = af[L2+1:]
err_band = np.abs(rec - alm)[band].max() / scale
print(f"# banded solve_lmax=2ns: band err = {err_band:.2e}", flush=True)

t0 = time.time()
full = np.asarray(xfer.get(jax.block_until_ready(
    jax.jit(lambda tt, g: _analysis_cg_grid(opF, tt, g, niter))(tF, g32))))
print(f"# full-lmax f32 CG({niter}): {time.time()-t0:.1f}s", flush=True)
err_full = np.abs(full - alm)[band].max() / scale
print(f"# full-lmax f32 CG: band err = {err_full:.2e}", flush=True)
print(f"# improvement: {err_full/max(err_band,1e-30):.0f}x", flush=True)
