"""EE/BB chi^2 spectral recovery on TPU hardware (spin-2 contract)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from cora_tpu.healpix import spin
from cora_tpu.util import xfer

nside, lmax, nreal = 16, 32, 4
L = lmax + 1
l = np.arange(L, dtype=np.float64)
clEE = np.where(l < 2, 0.0, (l + 1.0) ** -2.0)
clBB = np.where(l < 2, 0.0, 0.5 * (l + 1.0) ** -2.2)
li = np.arange(L)[:, None]; mi = np.arange(L)[None, :]
tri = mi <= li

def draw(rng, cl):
    a = (rng.standard_normal((L, L)) + 1j*rng.standard_normal((L, L))) * np.sqrt(0.5)
    a[:, 0] = rng.standard_normal(L)
    return np.where(tri, a, 0.0) * np.sqrt(cl)[:, None]

def cl_hat(a):
    w = np.where(mi[0] == 0, 1.0, 2.0)
    return (w * np.abs(a) ** 2).sum(axis=1) / (2 * l + 1)

op = spin.SpinSHT(nside, lmax, 2, l_chunk=16)
band = slice(2, 2 * nside + 1)
lb = l[band]
rng = np.random.default_rng(12)
t0 = time.time()
ee, bb = [], []
for r in range(nreal):
    E = draw(rng, clEE).astype(np.complex64)
    B = draw(rng, clBB).astype(np.complex64)
    Q, U = op.synthesis(xfer.put(E), xfer.put(B))
    E2, B2 = (np.asarray(xfer.get(x)) for x in op.analysis(Q, U, 3))
    ee.append(cl_hat(E2)); bb.append(cl_hat(B2))
print(f"# {nreal} realisations synth+analysis on {jax.devices()[0]}: {time.time()-t0:.1f}s", flush=True)
ee, bb = np.array(ee), np.array(bb)
for name, meas, cl in [("EE", ee, clEE), ("BB", bb, clBB)]:
    t_per = (2 * lb + 1) * meas[:, band] / cl[band]
    N = nreal * (2 * lb + 1).sum()
    zg = (t_per.sum() - N) / np.sqrt(2 * N)
    k = nreal * (2 * lb + 1)
    zl = np.abs((t_per.sum(axis=0) - k) / np.sqrt(2 * k)).max()
    print(f"# {name} recovery: global z = {zg:+.2f}, max per-ell |z| = {zl:.2f} (bounds 5.0/5.5)", flush=True)
