"""Host↔device transfer shims for quirky TPU runtimes.

The axon TPU runtime in this environment cannot ingest complex64 host
buffers at all (any size fails with UNIMPLEMENTED), and large float32
transfers degrade sharply with buffer size.  These helpers route every
host→device transfer through float32 chunks:

* complex arrays are shipped as (real, imag) float32 pairs and combined
  on device under jit (on-device complex math is fully supported);
* large float arrays are shipped in slices along their first axis and
  concatenated on device.

On well-behaved backends (CPU, standard TPU) the helpers reduce to plain
``jax.device_put`` semantics and cost one extra fused elementwise op.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Maximum bytes per single host->device transfer.  ~12 MB keeps each
# transfer in the regime that the tunnel handles at full speed.
_CHUNK_BYTES = 12 * 1024 * 1024


@jax.jit
def _combine(re, im):
    return re + 1j * im


def _put_chunked(x, device=None):
    """device_put a real array in first-axis slices bounded by _CHUNK_BYTES."""
    x = np.ascontiguousarray(x)
    if x.nbytes <= _CHUNK_BYTES or x.ndim == 0 or x.shape[0] <= 1:
        return jax.device_put(x, device)
    rows = max(1, int(_CHUNK_BYTES // max(1, x.nbytes // x.shape[0])))
    if rows >= x.shape[0]:
        return jax.device_put(x, device)
    parts = [
        jax.device_put(x[i : i + rows], device) for i in range(0, x.shape[0], rows)
    ]
    return jnp.concatenate(parts, axis=0)


def put(x, device=None):
    """Transfer one array host→device, working around backend quirks.

    Complex input is shipped as a float32/float64 (re, im) pair; large
    real input is chunked.  Returns a committed device array.
    """
    if isinstance(x, jax.Array):
        # Already on device — fetching it back to re-ship can itself hit
        # the broken complex D2H path; leave it where it is.
        return x
    x = np.asarray(x)
    if np.iscomplexobj(x):
        ftype = np.float32 if x.dtype == np.complex64 else np.float64
        re = _put_chunked(x.real.astype(ftype), device)
        im = _put_chunked(np.ascontiguousarray(x.imag).astype(ftype), device)
        return _combine(re, im)
    return _put_chunked(x, device)


def put_tree(tree, device=None):
    """Apply :func:`put` to every array leaf of a pytree (e.g. SHT tables)."""
    return jax.tree_util.tree_map(lambda l: put(l, device), tree)


@jax.jit
def zeros_like(x):
    """Jitted zeros_like: eager complex full() hits the broken-runtime
    path on axon (apply_primitive transfers the complex scalar host→device);
    under jit the constant materialises on device."""
    return jnp.zeros_like(x)


@jax.jit
def _re(x):
    return jnp.real(x)


@jax.jit
def _im(x):
    return jnp.imag(x)


def get(x):
    """Fetch a device array to host, working around broken complex D2H.

    Complex arrays are fetched as two real transfers and recombined on
    host; real arrays fetch directly.
    """
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if jnp.iscomplexobj(x):
        return np.asarray(_re(x)) + 1j * np.asarray(_im(x))
    return np.asarray(x)
