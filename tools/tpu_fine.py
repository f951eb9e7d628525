"""Fine-grained op probes for the nside=128 dense-op failure, one
subprocess each."""
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
    # draw sub-ops at nside=128 scale
    "rng": """
out = jax.jit(lambda k: jax.random.normal(k, (384, 32, 384), jnp.float32))(jax.random.PRNGKey(0))
""",
    "rng2": """
def f(k):
    kr, ki = jax.random.split(k)
    return (jax.random.normal(kr, (384, 32, 384), jnp.float32)
            + 1j * jax.random.normal(ki, (384, 32, 384), jnp.float32))
out = jax.jit(f)(jax.random.PRNGKey(0))
""",
    "einsum_draw": """
r = jnp.asarray(rng.randn(384, 32, 32).astype(np.float32))
xi = jnp.asarray((rng.randn(384, 32, 384) + 1j*rng.randn(384, 32, 384)).astype(np.complex64))
out = jax.jit(lambda a, b: jnp.einsum("lzy,lym->lzm", a.astype(jnp.complex64), b))(r, xi)
""",
    "sumabs": """
x = jnp.asarray((rng.randn(32, 384, 384) + 1j*rng.randn(32, 384, 384)).astype(np.complex64))
out = jax.jit(lambda a: jnp.sum(jnp.abs(a)))(x)
""",
    "moveaxis": """
x = jnp.asarray((rng.randn(384, 32, 384) + 1j*rng.randn(384, 32, 384)).astype(np.complex64))
out = jax.jit(lambda a: jnp.moveaxis(a, 0, 1))(x)
""",
    # legendre sub-ops
    "einsum_leg": """
lam = jnp.asarray(rng.randn(32, 256, 384).astype(np.float32))
ae = jnp.asarray((rng.randn(16, 32, 384) + 1j*rng.randn(16, 32, 384)).astype(np.complex64))
out = jax.jit(lambda p, q: jnp.einsum("lrm,...lm->...rm", p, q))(lam, ae)
""",
    "atadd": """
x = jnp.asarray((rng.randn(16, 256, 300) + 1j*rng.randn(16, 256, 300)).astype(np.complex64))
def f(a):
    G = jnp.zeros((16, 256, 384), jnp.complex64)
    return G.at[..., :300].add(a)
out = jax.jit(f)(x)
""",
    "where_gather": """
x = jnp.asarray((rng.randn(16, 256, 384) + 1j*rng.randn(16, 256, 384)).astype(np.complex64))
idx = jnp.asarray(np.clip(np.arange(511), 0, 255).astype(np.int32))
north = jnp.arange(511) < 256
out = jax.jit(lambda a: jnp.where(north[:, None], a[..., idx, :], a[..., idx[::-1], :]))(x)
""",
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        code = HEADER + f"NAME={name!r}\n" + STAGES[name] + FOOTER
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=480)
        except subprocess.TimeoutExpired as e:
            print(f"TIMEOUT {name}; partial: {e.stdout}", flush=True)
            continue
        if r.returncode != 0:
            err = [ln for ln in r.stderr.strip().splitlines() if "rror" in ln]
            print(f"FAIL {name}: {err[-1][:160] if err else r.stderr[-160:]}",
                  flush=True)
        else:
            print(r.stdout.strip(), flush=True)
