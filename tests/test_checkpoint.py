"""Sharded checkpoint IO (parallel/checkpoint.py) on the 8-device mesh.

Covers the memh5-parallel-HDF5 replacement contract: shard-wise save of
device-sharded arrays, restore to the same or a *different* sharding
(the reference's read-then-redistribute pattern, cora/core/skysim.py:128),
and container checkpoints with device-sharded datasets.
"""

import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cora_tpu.parallel import mesh as pmesh
from cora_tpu.parallel import checkpoint as ckpt
from cora_tpu.core.containers import Map


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def test_sharded_roundtrip_same_sharding(tmp_path, mesh8):
    x = jnp.arange(8 * 6, dtype=jnp.float64).reshape(8, 6)
    xs = pmesh.shard_over(x, mesh8, axis=0)
    tree = {"x": xs, "host": np.linspace(0.0, 1.0, 5)}

    path = ckpt.save_sharded(tmp_path / "ck1", tree)
    out = ckpt.restore_sharded(path, tree)

    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(x))
    np.testing.assert_array_equal(out["host"], tree["host"])
    assert out["x"].sharding.is_equivalent_to(xs.sharding, xs.ndim)


def test_restore_resharded(tmp_path, mesh8):
    """Restore with a different target sharding than the save used."""
    x = jnp.arange(8 * 8, dtype=jnp.float32).reshape(8, 8)
    xs = pmesh.shard_over(x, mesh8, axis=0)
    path = ckpt.save_sharded(tmp_path / "ck2", {"x": xs})

    tmpl = ckpt.abstract_like({"x": xs}, mesh=mesh8, pspecs={"x": P(None, "freq")})
    out = ckpt.restore_sharded(path, tmpl)

    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(x))
    want = NamedSharding(mesh8, P(None, "freq"))
    assert out["x"].sharding.is_equivalent_to(want, 2)


def test_container_checkpoint_sharded(tmp_path, mesh8):
    nside = 4
    nfreq = 8
    m = Map(polarisation=False, freq=np.linspace(400.0, 500.0, nfreq),
            nside=nside)
    m.attrs["tag"] = "testmap"
    m.attrs["vec"] = np.array([1.0, 2.0])

    sky = jnp.asarray(
        np.random.default_rng(0).standard_normal((nfreq, 1, 12 * nside**2))
    )
    sky_sharded = jax.device_put(
        sky, NamedSharding(mesh8, P("freq", None, None))
    )

    path = ckpt.save_container(tmp_path / "ckmap", m,
                               arrays={"map": sky_sharded})

    # restore to host
    m2 = ckpt.load_container(path)
    assert isinstance(m2, Map)
    np.testing.assert_allclose(np.asarray(m2["map"]), np.asarray(sky))
    np.testing.assert_array_equal(m2.index_map["freq"], m.index_map["freq"])
    assert m2.attrs["tag"] == "testmap"
    np.testing.assert_array_equal(m2.attrs["vec"], m.attrs["vec"])
    assert m2.nside == nside

    # restore device-sharded over a different axis (pixel)
    m3 = ckpt.load_container(
        path, mesh=mesh8, pspecs={"map": P(None, None, "freq")}
    )
    np.testing.assert_allclose(np.asarray(m3["map"]), np.asarray(sky))
    want = NamedSharding(mesh8, P(None, None, "freq"))
    assert m3["map"].sharding.is_equivalent_to(want, 3)

    # the memh5 HDF5 export still works from a restored container
    m2.datasets["map"] = np.asarray(m2["map"])
    m2.save(tmp_path / "ckmap.h5")
    m4 = Map.from_file(tmp_path / "ckmap.h5")
    np.testing.assert_allclose(m4["map"], np.asarray(sky))
