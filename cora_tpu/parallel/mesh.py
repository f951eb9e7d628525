"""Mesh construction and the sharded synthesis program.

The reference's parallel pattern (SURVEY.md "parallelism strategies") is
phase-wise axis sharding with global transposes:

* factorise C_l and draw a_lm sharded over ell (skysim.py:108-121),
* all-to-all to frequency shards (skysim.py:128),
* batched inverse SHT over local frequencies (skysim.py:130).

Here the whole thing is ONE pjit program over a 1-D mesh: the ell-sharded
eigh/draw and the freq-sharded SHT are connected by a
``with_sharding_constraint`` — XLA emits the ell→freq all-to-all over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="freq", devices=None):
    """Create a 1-D device mesh over the synthesis axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_over(x, mesh, axis=0, mesh_axis="freq"):
    """Place an array with one dimension sharded over the mesh axis."""
    spec = [None] * x.ndim
    spec[axis] = mesh_axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def redistribute(x, mesh, axis, mesh_axis="freq"):
    """Change the sharded dimension of an array (MPIArray.redistribute
    equivalent).  Inside jit this lowers to an all-to-all over ICI."""
    spec = [None] * x.ndim
    spec[axis] = mesh_axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def mkfullsky_sharded(corr, nside, lmax, key, mesh, dtype=jnp.complex64):
    """Full correlated-sky synthesis sharded over a device mesh.

    Phase 1 (ell-sharded): per-ell covariance root + correlated draw.
    Phase 2 (freq-sharded): batched native SHT.  The phase boundary is a
    single sharding constraint (the reference's MPI all-to-all,
    skysim.py:128).

    Parameters
    ----------
    corr : array [lmax+1, nz, nz]
    nside, lmax : int
    key : jax.random.PRNGKey
    mesh : jax.sharding.Mesh with axis "freq"

    Returns
    -------
    maps : jnp.ndarray[nz, 12*nside**2], sharded over nz.
    """
    from ..core.skysim import draw_correlated_alm
    from ..healpix.sht import get_sht, _synthesis_grid

    op = get_sht(int(nside), int(lmax))
    tables = op.tables(False)

    ell_sharding = NamedSharding(mesh, P("freq", None, None))
    freq_sharding = NamedSharding(mesh, P("freq", None, None))
    out_sharding = NamedSharding(mesh, P("freq", None, None))

    @jax.jit
    def _run(corr, key):
        # Phase 1: ell-sharded factorisation + draw
        corr = jax.lax.with_sharding_constraint(corr, ell_sharding)
        alm = draw_correlated_alm(corr, key, dtype=dtype)  # [nz, L, M]
        # Phase boundary: redistribute ell->freq (all-to-all over ICI)
        alm = jax.lax.with_sharding_constraint(alm, freq_sharding)
        # Phase 2: freq-sharded batched SHT (dense ring-grid layout)
        sky = _synthesis_grid(op, tables, alm)
        return jax.lax.with_sharding_constraint(sky, out_sharding)

    with mesh:
        return _run(jnp.asarray(corr), key)
