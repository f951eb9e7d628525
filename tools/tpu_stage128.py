"""Stage-by-stage probe of the bench path at nside=128, one subprocess per
stage (axon backend can poison/hang a process; see tools/tpu_ops.py)."""
import subprocess
import sys

HEADER = """
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
rng = np.random.RandomState(0)
nside, nfreq, fchunk = {nside}, {nfreq}, {fchunk}
lmax = 3 * nside - 1
L = lmax + 1
from cora_tpu.healpix.sht import SHT, _synthesis_grid, _legendre_contract_cached, _rings_to_grid
t0 = time.time()
op = SHT(nside, lmax, legendre_mode="cached", fft_mode="mm")
tabs = op.tables(False)
print("tables built: %.1fs" % (time.time()-t0,), flush=True)
"""

STAGES = {
    "draw": """
roots = jnp.asarray(rng.randn(L, nfreq, nfreq).astype(np.float32))
mmask = (jnp.arange(L)[None, :] <= jnp.arange(L)[:, None]).astype(jnp.float32)
@jax.jit
def draw(key, r, mm):
    kr, ki = jax.random.split(key)
    shape = (L, nfreq, L)
    xi = (jax.random.normal(kr, shape, jnp.float32)
          + 1j * jax.random.normal(ki, shape, jnp.float32)) * (0.70710678 * mm[:, None, :])
    alm = jnp.einsum("lzy,lym->lzm", r.astype(jnp.complex64), xi)
    return jnp.moveaxis(alm, 0, 1)
t0 = time.time()
s = float(jnp.sum(jnp.abs(draw(jax.random.PRNGKey(0), roots, mmask))).astype(jnp.float32))
print("OK draw: %.1fs sum=%.3e" % (time.time()-t0, s), flush=True)
t0 = time.time()
s = float(jnp.sum(jnp.abs(draw(jax.random.PRNGKey(1), roots, mmask))).astype(jnp.float32))
print("OK draw2: %.2fs" % (time.time()-t0,), flush=True)
""",
    "legendre": """
alm = jnp.asarray((rng.randn(fchunk, L, L) + 1j*rng.randn(fchunk, L, L)).astype(np.complex64))
f = jax.jit(lambda t, a: jnp.sum(jnp.abs(_legendre_contract_cached(op, t, a))))
t0 = time.time()
s = float(f(tabs, alm))
print("OK legendre: %.1fs sum=%.3e" % (time.time()-t0, s), flush=True)
t0 = time.time(); s = float(f(tabs, alm))
print("OK legendre2: %.2fs" % (time.time()-t0,), flush=True)
""",
    "rings": """
G = jnp.asarray((rng.randn(fchunk, op.nring, L) + 1j*rng.randn(fchunk, op.nring, L)).astype(np.complex64))
f = jax.jit(lambda t, g: jnp.sum(jnp.abs(_rings_to_grid(op, t, g))))
t0 = time.time()
s = float(f(tabs, G))
print("OK rings: %.1fs sum=%.3e" % (time.time()-t0, s), flush=True)
t0 = time.time(); s = float(f(tabs, G))
print("OK rings2: %.2fs" % (time.time()-t0,), flush=True)
""",
    "synth": """
alm = jnp.asarray((rng.randn(fchunk, L, L) + 1j*rng.randn(fchunk, L, L)).astype(np.complex64))
f = jax.jit(lambda t, a: jnp.sum(jnp.abs(_synthesis_grid(op, t, a))))
t0 = time.time()
s = float(f(tabs, alm))
print("OK synth: %.1fs sum=%.3e" % (time.time()-t0, s), flush=True)
t0 = time.time(); s = float(f(tabs, alm))
print("OK synth2: %.2fs" % (time.time()-t0,), flush=True)
""",
}

if __name__ == "__main__":
    nside = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    names = sys.argv[2:] or list(STAGES)
    hdr = HEADER.format(nside=nside, nfreq=32, fchunk=16)
    for name in names:
        code = hdr + STAGES[name]
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=480,
            )
        except subprocess.TimeoutExpired as e:
            print(f"TIMEOUT {name} (480s); partial: {e.stdout}", flush=True)
            continue
        if r.returncode != 0:
            err = [ln for ln in r.stderr.strip().splitlines() if "rror" in ln]
            print(f"FAIL {name}: {err[-1][:200] if err else r.stderr[-200:]}",
                  flush=True)
            if r.stdout.strip():
                print(f"  partial: {r.stdout.strip()}", flush=True)
        else:
            print(r.stdout.strip(), flush=True)
