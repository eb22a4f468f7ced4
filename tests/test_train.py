"""Training-step tests: loss decreases, grads flow, sharded == single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import RenderConfig, TrainConfig
from nerf_rs_tpu.parallel.mesh import make_mesh
from nerf_rs_tpu.parallel.train_sharded import (
    create_sharded_train_state,
    shard_batch,
    sharded_train_step,
)
from nerf_rs_tpu.train import create_train_state, nerf_loss, train_step

TINY = TrainConfig(batch_rays=64, render=RenderConfig(n_coarse=8, n_fine=8, ray_chunk=64))


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return {
        "origins": jnp.zeros((n, 3), jnp.float32),
        "dirs": jnp.asarray(dirs),
        "rgb": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        "near": jnp.float32(2.0),
        "far": jnp.float32(6.0),
    }


def test_loss_finite_and_grads_nonzero():
    state = create_train_state(jax.random.key(0), TINY)
    batch = _batch(TINY.batch_rays)
    loss, metrics = nerf_loss(state.params, batch, jax.random.key(1), TINY)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: nerf_loss(p, batch, jax.random.key(1), TINY)[0])(state.params)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0.0


def test_training_reduces_loss():
    state = create_train_state(jax.random.key(0), TINY)
    batch = _batch(TINY.batch_rays)
    first = None
    for i in range(20):
        state, metrics = train_step(state, batch, jax.random.key(42), TINY)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_sharded_step_matches_single_device():
    """Data-parallel step over the 8-device CPU mesh == single-device step."""
    mesh = make_mesh()
    assert mesh.devices.size == 8, "conftest should force 8 virtual CPU devices"
    batch = _batch(TINY.batch_rays)

    state1 = create_train_state(jax.random.key(0), TINY)
    state1, m1 = train_step(state1, batch, jax.random.key(1), TINY)

    _, state8 = create_sharded_train_state(jax.random.key(0), TINY, mesh)
    state8, m8 = sharded_train_step(mesh, state8, batch, jax.random.key(1), TINY)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = shard_batch(mesh, _batch(64))
    assert batch["dirs"].sharding.is_fully_replicated is False
    assert batch["near"].sharding.is_fully_replicated is True
