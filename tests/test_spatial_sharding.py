"""Spatial partitioning: image height sharded over the model axis.

XLA inserts conv halo exchanges; results must match the unsharded run.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_detector import tiny_batch, tiny_config
from two_stage_object_detection_tpu.nets.trainer import (
    create_train_state, train_step)
from two_stage_object_detection_tpu.parallel.mesh import (
    make_mesh, replicate, shard_batch_spatial)

pytestmark = pytest.mark.slow


def test_spatial_sharded_train_step_matches_single_device():
    cfg = tiny_config(batch_size=2, grad_accum_steps=1)
    _, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                  init_image_size=(32, 32))
    rng = np.random.RandomState(0)
    batch = tiny_batch(cfg, rng)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}

    state_single = jax.tree_util.tree_map(jnp.array, state)
    _, losses_single = train_step(state_single, batch_np, jax.random.PRNGKey(1))

    mesh = make_mesh(n_data=2, n_model=4)
    state_sh = replicate(jax.tree_util.tree_map(jnp.array, state), mesh)
    batch_sh = shard_batch_spatial(batch_np, mesh)
    assert len(batch_sh["image"].sharding.device_set) == 8
    _, losses_sh = train_step(state_sh, batch_sh, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(losses_single["total"]),
                               float(losses_sh["total"]), rtol=3e-4)
