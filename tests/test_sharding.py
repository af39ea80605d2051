"""Multi-device tests on the fake 8-CPU-device backend (conftest sets
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_stage_object_detection_tpu.parallel.mesh import (
    make_mesh, replicate, shard_batch)
from two_stage_object_detection_tpu.parallel.sharding import (
    infer_param_sharding)


def test_eight_fake_devices():
    assert jax.device_count() >= 8


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh()   # all devices on data
    assert mesh.shape["data"] == jax.device_count()


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(n_data=8, n_model=1)
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = shard_batch(batch, mesh)
    assert len(sharded["x"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded["x"]), batch["x"])


def test_param_sharding_rules():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "Dense_0": {"kernel": jnp.zeros((64, 128)), "bias": jnp.zeros((128,))},
        "Conv_0": {"kernel": jnp.zeros((3, 3, 16, 32))},   # convs replicated
        "odd": {"kernel": jnp.zeros((64, 127))},   # indivisible -> replicated
    }
    sh = infer_param_sharding(params, mesh)
    assert sh["Dense_0"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["Dense_0"]["bias"].spec == jax.sharding.PartitionSpec()
    assert sh["Conv_0"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_data_parallel_train_step_matches_single_device():
    """Gradient math is identical whether the batch lives on 1 or 8 devices."""
    from two_stage_object_detection_tpu.nets.trainer import (
        create_train_state, train_step)
    from tests.test_detector import tiny_batch, tiny_config

    cfg = tiny_config(batch_size=8, grad_accum_steps=1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    rng = np.random.RandomState(0)
    batch = tiny_batch(cfg, rng)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    state_single = jax.tree_util.tree_map(jnp.array, state)
    _, losses_single = train_step(state_single, batch_np, jax.random.PRNGKey(1))

    mesh = make_mesh(n_data=8, n_model=1)
    state_sharded = replicate(jax.tree_util.tree_map(jnp.array, state), mesh)
    batch_sharded = shard_batch(batch_np, mesh)
    _, losses_sharded = train_step(state_sharded, batch_sharded,
                                   jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(losses_single["total"]),
                               float(losses_sharded["total"]),
                               rtol=2e-4)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
