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


def synthesize_cube_sharded(
    op, tables, roots, key, mesh, fchunk=None, mesh_axis="freq"
):
    """Streamed correlated synthesis sharded over frequency.

    Multi-chip form of :func:`cora_tpu.healpix.sht.synthesis_grid_correlated`
    built with ``shard_map``: every device regenerates the identical per-ℓ
    white-noise blocks from the same key (RNG is cheap and deterministic)
    and contracts only its own rows of the covariance roots — so the
    frequency axis scales with zero inter-chip communication (the
    reference needs an MPI all-to-all here, skysim.py:128; streaming the
    draw removes it entirely).

    Parameters
    ----------
    op, tables : SHT operator (cached legendre mode) and its device tables.
    roots : [L, nz, nz] real per-ell covariance roots; nz must be divisible
        by mesh size.
    fchunk : frequencies synthesized per inner step on each device.

    Returns
    -------
    [nz, nring, nq_max] dense ring-grid cube, sharded over frequency.
    """
    from functools import partial

    try:  # jax >= 0.8 moved shard_map out of experimental
        from jax import shard_map as _shard_map

        def shard_map(f, **kw):
            rep = kw.pop("check_rep", None)
            if rep is not None:
                kw["check_vma"] = rep
            return _shard_map(f, **kw)

    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from ..healpix.sht import synthesis_scan_correlated

    n_dev = mesh.shape[mesh_axis]
    L, _, nz = roots.shape
    if nz % n_dev:
        raise ValueError(f"nz={nz} not divisible by mesh size {n_dev}")
    nloc = nz // n_dev
    fchunk = min(fchunk or nloc, nloc)

    spec_r = P(None, mesh_axis, None)  # roots sharded over the z-row axis
    spec_o = P(mesh_axis, None, None)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_r, P()),
        out_specs=spec_o,
        check_rep=False,
    )
    def _local(roots_rows, key):
        # roots_rows: [L, nloc, nz] — this device's output frequencies.
        # Two-level scan: Legendre stage over all local frequencies (full
        # MXU row tiles, one-shot RNG), ring stage at fchunk.
        nring = 4 * op.nside - 1
        nq = tables["bl_C"].shape[-1]
        out = jnp.zeros((nloc, nring, nq), jnp.float32)
        return synthesis_scan_correlated(
            op, tables, roots_rows, key, nloc, fchunk,
            lambda g, z, acc: jax.lax.dynamic_update_slice_in_dim(
                acc, g, z, axis=0
            ),
            out,
        )

    with mesh:
        roots_d = jax.device_put(
            jnp.asarray(roots), NamedSharding(mesh, spec_r)
        )
        return jax.jit(_local)(roots_d, key)
