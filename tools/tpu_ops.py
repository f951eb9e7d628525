"""Probe individual ops on the TPU backend, one subprocess per op."""
import subprocess
import sys
import os

STAGES = {
    "fft1024": """
x = jnp.asarray((rng.randn(16, 511, 1024) + 1j*rng.randn(16, 511, 1024)).astype(np.complex64))
out = jax.jit(lambda a: jnp.fft.fft(a, axis=-1))(x)
""",
    "fft512": """
x = jnp.asarray((rng.randn(16, 511, 512) + 1j*rng.randn(16, 511, 512)).astype(np.complex64))
out = jax.jit(lambda a: jnp.fft.fft(a, axis=-1))(x)
""",
    "einsum": """
a = jnp.asarray(rng.randn(64, 512, 384).astype(np.float32))
b = jnp.asarray((rng.randn(16, 64, 384) + 1j*rng.randn(16, 64, 384)).astype(np.complex64))
out = jax.jit(lambda p, q: jnp.einsum("lrm,...lm->...rm", p, q))(a, b)
""",
    "scatter": """
G = jnp.asarray((rng.randn(16, 511, 384)+1j*rng.randn(16, 511, 384)).astype(np.complex64))
fold = jnp.asarray(rng.randint(0, 1020, (511, 384)).astype(np.int32))
def sc(g):
    H = jnp.zeros((16, 511, 2048), jnp.complex64)
    ridx = jnp.broadcast_to(jnp.arange(511)[:, None], fold.shape)
    return H.at[..., ridx, fold].add(g)
out = jax.jit(sc)(G)
""",
    "gather": """
y = jnp.asarray((rng.randn(16, 511, 1024) + 1j*rng.randn(16, 511, 1024)).astype(np.complex64))
rp = jnp.asarray(rng.randint(0, 511, 786432).astype(np.int32))
jp = jnp.asarray(rng.randint(0, 1020, 786432).astype(np.int32))
out = jax.jit(lambda h: h[..., rp, jp])(y)
""",
    "eigh": """
C = rng.randn(768, 256, 256).astype(np.float32); C = C @ C.transpose(0,2,1)
out = jax.jit(lambda c: jnp.linalg.eigh(c)[0])(jnp.asarray(C))
""",
    "mmfft2048": """
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if '__file__' in dir() else '/root/repo')
from cora_tpu.ops import fftmm
tabs = fftmm.dft_tables(2048)
td = {k: jnp.asarray(v) for k, v in tabs['fwd'].items()}
x = jnp.asarray((rng.randn(16, 511, 2048) + 1j*rng.randn(16, 511, 2048)).astype(np.complex64))
out = jax.jit(lambda a: fftmm._apply(a, td, *tabs['n1n2']))(x)
""",
    "pad": """
x = jnp.asarray((rng.randn(16, 511, 1024)).astype(np.float32))
out = jax.jit(lambda a: jnp.pad(a, [(0,0),(0,0),(0,1024)]))(x)
""",
    "bigzeros": """
out = jax.jit(lambda: jnp.zeros((16, 511, 2048), jnp.complex64))()
""",
}


STAGES["gather60k"] = """
y = jnp.asarray((rng.randn(8, 511, 1024) + 1j*rng.randn(8, 511, 1024)).astype(np.complex64))
rp = jnp.asarray(rng.randint(0, 511, 60000).astype(np.int32))
jp = jnp.asarray(rng.randint(0, 1020, 60000).astype(np.int32))
out = jax.jit(lambda h: h[..., rp, jp])(y)
"""
STAGES["gather70k"] = """
y = jnp.asarray((rng.randn(8, 511, 1024) + 1j*rng.randn(8, 511, 1024)).astype(np.complex64))
rp = jnp.asarray(rng.randint(0, 511, 70000).astype(np.int32))
jp = jnp.asarray(rng.randint(0, 1020, 70000).astype(np.int32))
out = jax.jit(lambda h: h[..., rp, jp])(y)
"""
STAGES["gather786k_f32"] = """
y = jnp.asarray(rng.randn(8, 511, 1024).astype(np.float32))
rp = jnp.asarray(rng.randint(0, 511, 786432).astype(np.int32))
jp = jnp.asarray(rng.randint(0, 1020, 786432).astype(np.int32))
out = jax.jit(lambda h: h[..., rp, jp])(y)
"""
STAGES["gather786k_1d"] = """
y = jnp.asarray((rng.randn(8, 511*1024) + 1j*rng.randn(8, 511*1024)).astype(np.complex64))
fi = jnp.asarray(rng.randint(0, 511*1024, 786432).astype(np.int32))
out = jax.jit(lambda h: h[:, fi])(y)
"""
STAGES["scatter_f32"] = """
G = jnp.asarray(rng.randn(16, 511, 384).astype(np.float32))
fold = jnp.asarray(rng.randint(0, 1020, (511, 384)).astype(np.int32))
def sc(g):
    H = jnp.zeros((16, 511, 2048), jnp.float32)
    ridx = jnp.broadcast_to(jnp.arange(511)[:, None], fold.shape)
    return H.at[..., ridx, fold].add(g)
out = jax.jit(sc)(G)
"""
STAGES["scatter_1d"] = """
G = jnp.asarray((rng.randn(16, 511*384) + 1j*rng.randn(16, 511*384)).astype(np.complex64))
fi = jnp.asarray(rng.randint(0, 511*2048, 511*384).astype(np.int32))
def sc(g):
    H = jnp.zeros((16, 511*2048), jnp.complex64)
    return H.at[:, fi].add(g)
out = jax.jit(sc)(G)
"""

TEMPLATE = """
import sys, os, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
rng = np.random.RandomState(0)
t0 = time.time()
{body}
s = float(jnp.sum(jnp.abs(out)).astype(jnp.float32))
print("OK {name}: %.1fs sum=%.3e" % (time.time()-t0, s), flush=True)
"""

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        code = TEMPLATE.format(body=STAGES[name], name=name)
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=480,
            )
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name} (480s)", flush=True)
            continue
        out = r.stdout.strip()
        if r.returncode != 0:
            err = [
                ln
                for ln in r.stderr.strip().splitlines()
                if "Error" in ln or "error" in ln
            ]
            print(f"FAIL {name}: {err[-1][:160] if err else r.stderr[-160:]}", flush=True)
        else:
            print(out, flush=True)
