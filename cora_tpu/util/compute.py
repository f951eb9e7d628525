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


def on_model_device(fn):
    """Decorator form of :func:`model_device`."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with model_device():
            return fn(*args, **kwargs)

    return wrapper
