"""Device-placement helpers.

Model *building* (constrained galaxy realisations, Faraday screens,
point-source painting) is small-transform, float64-heavy host work; the
TPU is for the big synthesis programs.  ``model_device()`` routes the
model-building math to the in-process CPU device when the default backend
is an accelerator, so the full CLI works unchanged inside a TPU process.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def model_device():
    """Context: run enclosed jax ops on the host CPU device if the
    default backend is an accelerator (no-op on CPU)."""
    if jax.default_backend() == "cpu":
        yield
        return
    with jax.default_device(jax.devices("cpu")[0]):
        yield


def placement_on_cpu() -> bool:
    """True when ops dispatched *right now* land on the host CPU device.

    Distinct from ``jax.default_backend() == "cpu"``: inside a TPU
    process a ``model_device()`` (``jax.default_device``) scope routes
    ops to the in-process CPU device while the default backend stays the
    accelerator.  Pallas TPU kernels cannot lower there ("Only interpret
    mode is supported on CPU backend"), so every kernel-vs-XLA selection
    must consult the placement, not the backend (the galaxy model path
    crashed exactly this way — mkconstrained's host map2alm picking the
    fused adjoint inside a TPU process)."""
    try:
        if jax.default_backend() == "cpu":
            return True
        dd = jax.config.jax_default_device
        return dd is not None and getattr(dd, "platform", None) == "cpu"
    except Exception:  # pragma: no cover
        return True


@contextlib.contextmanager
def accel_device():
    """Context: escape a :func:`model_device` region back onto the
    accelerator (no-op on CPU backends).  ``jax.default_device`` only
    changes op *placement*, so ``jax.devices()`` still lists the true
    default backend's devices inside a model_device block."""
    if jax.default_backend() == "cpu":
        yield
        return
    with jax.default_device(jax.devices()[0]):
        yield


def prefetch_backend_init():
    """Dispatch a trivial device program WITHOUT blocking on it.

    Tunnelled TPU runtimes pay a one-time session-init flush on the first
    *executed* program (~72 s warm service / ~306 s cold on the axon
    backend; tools/coldstart_r4b*.out).  The flush proceeds server-side
    once dispatched (tools/flush_overlap.out hid it completely behind
    75 s of host work), so calling this at process start makes all
    subsequent host-side setup — imports, table builds, compiles —
    overlap it instead of stacking on top of it.

    No-op on CPU backends.  Returns the dispatched array (block on it to
    measure the un-hidden remainder) or None.
    """
    if jax.default_backend() == "cpu":
        return None
    import jax.numpy as jnp

    return jax.jit(lambda x: x + 1.0)(jnp.zeros(8, jnp.float32))


def enable_compile_cache(cache_dir=None, min_compile_secs=0.0):
    """Enable JAX's persistent compilation cache for this process.

    The big synthesis programs cost minutes to compile on TPU backends;
    the reference never recompiles anything (its hot loops are AOT Cython
    / libsharp, cora/setup.py:104-129), so repeated-invocation parity
    requires compiled programs to survive the process.  bench.py has
    always done this for the driver; this helper gives the CLI and
    library users the same behaviour.

    cache_dir — explicit directory; default is $CORA_TPU_COMPILE_CACHE,
    else ``<table-cache>/xla`` next to the Λ/checkpoint table cache
    (``~/.cache/cora_tpu``).  Set CORA_TPU_COMPILE_CACHE="" to disable.
    Returns the directory used, or None if disabled/unwritable.

    On pure-CPU backends the cache stays OFF unless explicitly requested
    (cache_dir argument or the env var): XLA:CPU serialises host-ISA AOT
    kernels whose feature strings don't round-trip reliably (loud loader
    warnings, SIGILL risk if the cache dir moves between machines), and
    CPU compiles of these programs cost seconds, not minutes.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("CORA_TPU_COMPILE_CACHE")
        if cache_dir == "":
            return None
    if cache_dir is None:
        if jax.default_backend() == "cpu":
            return None
        # respect a cache dir the user already configured through JAX's
        # own knobs (JAX_COMPILATION_CACHE_DIR / jax.config) — only pick
        # our per-user default when nothing is set
        existing = jax.config.jax_compilation_cache_dir
        if existing:
            return existing
        from ..healpix.sht import _user_cache_dir

        base = _user_cache_dir()
        if base is None:
            return None
        cache_dir = os.path.join(base, "xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        changed = jax.config.jax_compilation_cache_dir != cache_dir
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        if changed:
            # the persistent cache object is created once on first use;
            # re-pointing the directory afterwards requires a reset
            try:
                from jax._src import compilation_cache as _cc

                _cc.reset_cache()
            except Exception:
                pass
        # the default gates (min 1 s compile, min size) would skip most of
        # the mid-sized model programs — cache everything
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir


def on_model_device(fn):
    """Decorator form of :func:`model_device`."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with model_device():
            return fn(*args, **kwargs)

    return wrapper
