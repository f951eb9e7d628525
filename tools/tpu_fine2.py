"""Separate host->device transfer failures from compute failures on axon."""
import subprocess
import sys

HEADER = """
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
rng = np.random.RandomState(0)
t0 = time.time()
"""

FOOTER = """
s = float(jnp.sum(jnp.abs(out)).astype(jnp.float32))
print("OK %s: %.1fs sum=%.3e" % (NAME, time.time()-t0, s), flush=True)
"""

STAGES = {
    # pure transfer + elementwise, size ladder (complex64)
    "xferC_6M": """
y = jnp.asarray((rng.randn(16, 128, 384)+1j*rng.randn(16, 128, 384)).astype(np.complex64))
out = jax.jit(lambda a: a * 2.0)(y)
""",
    "xferC_13M": """
y = jnp.asarray((rng.randn(16, 256, 384)+1j*rng.randn(16, 256, 384)).astype(np.complex64))
out = jax.jit(lambda a: a * 2.0)(y)
""",
    "xferC_38M": """
y = jnp.asarray((rng.randn(32, 384, 384)+1j*rng.randn(32, 384, 384)).astype(np.complex64))
out = jax.jit(lambda a: a * 2.0)(y)
""",
    # f32 ladder
    "xferF_13M": """
y = jnp.asarray(rng.randn(16, 512, 384).astype(np.float32))
out = jax.jit(lambda a: a * 2.0)(y)
""",
    "xferF_50M": """
y = jnp.asarray(rng.randn(64, 512, 384).astype(np.float32))
out = jax.jit(lambda a: a * 2.0)(y)
""",
    # complex batched matmul, data created ON DEVICE (no host complex)
    "cmm_dev": """
def f(k):
    kr, ki = jax.random.split(k)
    xi = (jax.random.normal(kr, (384, 32, 384), jnp.float32)
          + 1j * jax.random.normal(ki, (384, 32, 384), jnp.float32))
    r = jax.random.normal(k, (384, 32, 32), jnp.float32).astype(jnp.complex64)
    return jnp.einsum("lzy,lym->lzm", r, xi)
out = jax.jit(f)(jax.random.PRNGKey(0))
""",
    # same contraction via real/imag split (real MXU matmuls only)
    "cmm_real": """
def f(k):
    kr, ki = jax.random.split(k)
    xr = jax.random.normal(kr, (384, 32, 384), jnp.float32)
    xi = jax.random.normal(ki, (384, 32, 384), jnp.float32)
    r = jax.random.normal(k, (384, 32, 32), jnp.float32)
    yr = jnp.einsum("lzy,lym->lzm", r, xr)
    yi = jnp.einsum("lzy,lym->lzm", r, xi)
    return yr + 1j * yi
out = jax.jit(f)(jax.random.PRNGKey(0))
""",
    # transpose of on-device complex
    "mova_dev": """
def f(k):
    kr, ki = jax.random.split(k)
    x = (jax.random.normal(kr, (384, 32, 384), jnp.float32)
         + 1j * jax.random.normal(ki, (384, 32, 384), jnp.float32))
    return jnp.moveaxis(x, 0, 1)
out = jax.jit(f)(jax.random.PRNGKey(0))
""",
    # chunked host transfer of complex64 38MB: pieces < 5MB, concat on device
    "xferC_chunked": """
h = (rng.randn(32, 384, 384)+1j*rng.randn(32, 384, 384)).astype(np.complex64)
parts = [jax.device_put(h[i:i+2]) for i in range(0, 32, 2)]
out = jax.jit(lambda *p: jnp.concatenate(p, axis=0) * 2.0)(*parts)
""",
    # real-pair host transfer of the same 38MB payload, combine on device
    "xferC_pair": """
h = (rng.randn(32, 384, 384)+1j*rng.randn(32, 384, 384)).astype(np.complex64)
hr = jnp.asarray(np.ascontiguousarray(h.real))
hi = jnp.asarray(np.ascontiguousarray(h.imag))
out = jax.jit(lambda a, b: (a + 1j*b) * 2.0)(hr, hi)
""",
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        code = HEADER + f"NAME={name!r}\n" + STAGES[name] + FOOTER
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=420)
        except subprocess.TimeoutExpired as e:
            print(f"TIMEOUT {name}; partial: {e.stdout}", flush=True)
            continue
        if r.returncode != 0:
            err = [ln for ln in r.stderr.strip().splitlines() if "rror" in ln]
            print(f"FAIL {name}: {err[-1][:160] if err else r.stderr[-160:]}",
                  flush=True)
        else:
            print(r.stdout.strip(), flush=True)
