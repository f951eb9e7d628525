"""Host-compatible pmesh API (reference cora/util/pmesh.pyx surface).

Thin numpy wrappers over the jittable kernels in cora_tpu.ops.pmesh, kept
for drop-in compatibility with code written against the reference's Cython
module: ``calculate_positions``, ``_pixel_weights``, ``_radial_weights``
and ``_bin_delta``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import pmesh as _ops


def calculate_positions(angpos, displacement):
    """Apply angular displacements with wrapping (numpy in/out)."""
    return np.asarray(
        _ops.calculate_positions(jnp.asarray(angpos), jnp.asarray(displacement))
    )


def _pixel_weights(
    new_ang_ind,
    new_ang_vec,
    scaling,
    sigma,
    nn_ind,
    nn_vec,
    pixel_ind,
    pixel_weight,
):
    """Gaussian SPH pixel weights; fills the output arrays in place."""
    pi, pw = _ops.pixel_weights(
        jnp.asarray(new_ang_ind),
        jnp.asarray(new_ang_vec),
        jnp.asarray(scaling),
        float(sigma),
        jnp.asarray(nn_ind),
        jnp.asarray(nn_vec),
    )
    pixel_ind[:] = np.asarray(pi)
    pixel_weight[:] = np.asarray(pw)


def _radial_weights(
    new_chi_ind, new_chi, scaling, sigma, nnh, chi, radial_ind, radial_weight
):
    """Gaussian SPH radial weights; fills the output arrays in place."""
    ri, rw = _ops.radial_weights(
        jnp.asarray(new_chi_ind),
        jnp.asarray(new_chi),
        jnp.asarray(scaling),
        float(sigma),
        int(nnh),
        jnp.asarray(chi),
    )
    radial_ind[:] = np.asarray(ri)
    radial_weight[:] = np.asarray(rw)


def _bin_delta(rho, pixel_ind, pixel_weight, radial_ind, radial_weight, out):
    """Scatter-add particle masses into `out` (numpy accumulate in place)."""
    res = _ops.bin_delta(
        jnp.asarray(rho),
        jnp.asarray(pixel_ind),
        jnp.asarray(pixel_weight),
        jnp.asarray(radial_ind),
        jnp.asarray(radial_weight),
        jnp.zeros_like(jnp.asarray(out)),
    )
    out += np.asarray(res)
