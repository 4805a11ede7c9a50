"""Mesh/sharding unit tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vqvae_speech_tpu.parallel.mesh import (
    MeshConfiguration, make_mesh, shard_batch, replicate)
from vqvae_speech_tpu.data.prefetch import prefetch_to_device


def test_make_mesh_shapes():
    mesh = make_mesh(num_data=8, num_model=1)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh42 = make_mesh(num_data=4, num_model=2)
    assert mesh42.shape == {"data": 4, "model": 2}


def test_mesh_configuration_from_config():
    mc = MeshConfiguration.load_from_configuration(
        {"use_data_parallel": True})
    assert mc.data_axis_size == 8 and mc.use_data_parallel
    mc1 = MeshConfiguration.load_from_configuration(
        {"use_data_parallel": False})
    assert mc1.data_axis_size == 1 and not mc1.use_data_parallel


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(num_data=8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["x"].sharding
    assert shards.spec == P("data")
    assert len(sharded["x"].addressable_shards) == 8
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_replicate_places_everywhere():
    mesh = make_mesh(num_data=8)
    tree = {"w": jnp.ones((4, 4))}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.spec == P()
    assert rep["w"].sharding.is_fully_replicated


def test_psum_compiles_over_mesh():
    """A sharded-batch mean under jit produces the global mean (XLA inserts
    the cross-device reduction)."""
    mesh = make_mesh(num_data=8)
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    xs = shard_batch({"x": x}, mesh)["x"]

    @jax.jit
    def global_mean(v):
        return jnp.mean(v)

    np.testing.assert_allclose(float(global_mean(xs)), x.mean(), rtol=1e-6)


def test_prefetch_to_device_yields_all_batches():
    batches = [{"a": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["a"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["a"]),
                                      np.full((2, 2), i))


def test_prefetch_with_mesh_shards():
    mesh = make_mesh(num_data=8)
    batches = [{"a": np.arange(16, dtype=np.float32).reshape(8, 2)}]
    out = list(prefetch_to_device(iter(batches), mesh=mesh))
    assert out[0]["a"].sharding.spec == P("data")
