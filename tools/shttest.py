import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
import time
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
print("devices:", jax.devices())
import jax.numpy as jnp
from cora_tpu.healpix import sht, pixel
from scipy.special import sph_harm_y

nside, lmax = 16, 20
t0 = time.time()
op = sht.SHT(nside, lmax, l_chunk=8)
print("init", time.time() - t0)

th, ph = pixel.pix2ang(nside, np.arange(pixel.nside2npix(nside)))
rng = np.random.RandomState(0)
maxerr = 0
t0 = time.time()
for (l, m) in [(0, 0), (1, 0), (1, 1), (5, 3), (10, 7), (20, 20), (13, 0)]:
    alm = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
    c = rng.randn() + 1j * rng.randn()
    if m == 0:
        c = c.real + 0j
    alm[l, m] = c
    mp = np.asarray(op.synthesis(jnp.asarray(alm)))
    Y = sph_harm_y(l, m, th, ph)
    expect = (c * Y).real if m == 0 else 2 * np.real(c * Y)
    err = np.abs(mp - expect).max() / np.abs(expect).max()
    maxerr = max(maxerr, err)
    print(f"l={l} m={m}: rel err {err:.2e}  ({time.time()-t0:.1f}s)")
print("synthesis max rel err:", maxerr)

# round trip: random band-limited alm -> map -> alm
nside, lmax = 32, 31
op2 = sht.SHT(nside, lmax)
alm = rng.randn(lmax + 1, lmax + 1) + 1j * rng.randn(lmax + 1, lmax + 1)
lidx = np.arange(lmax + 1)[:, None]
midx = np.arange(lmax + 1)[None, :]
alm[midx > lidx] = 0.0
alm[:, 0] = alm[:, 0].real
m2 = op2.synthesis(jnp.asarray(alm))
alm2 = np.asarray(op2.analysis(m2, 3))
err = np.abs(alm2 - alm).max() / np.abs(alm).max()
print("roundtrip rel err (iter=3):", err)
