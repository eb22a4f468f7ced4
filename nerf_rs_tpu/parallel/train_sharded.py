"""Multi-chip training: ray-data-parallel over a jax.sharding.Mesh.

Shardings: batch leading axis -> P("rays"), params/opt-state replicated.
Under jit this compiles to per-chip fwd+bwd plus one psum all-reduce of the
MLP gradients over ICI (params are ~2.4 MB per network, so replication +
grad all-reduce is the right layout — SURVEY.md §2).

Multi-host: call `jax.distributed.initialize()` before building the mesh;
the same code then spans hosts (DCN across hosts, ICI within a slice).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from nerf_rs_tpu.config import TrainConfig
from nerf_rs_tpu.parallel.mesh import make_mesh, ray_sharding, replicate, replicated_sharding
from nerf_rs_tpu.train import TrainState, create_train_state, train_step


def shard_batch(mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Leading-axis-shard the per-ray arrays ((B, ...), ndim >= 2);
    replicate scalars and single vectors like a shared (3,) origin."""
    ray_sh = ray_sharding(mesh)
    rep_sh = replicated_sharding(mesh)
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v)
        out[k] = jax.device_put(v, ray_sh if v.ndim >= 2 else rep_sh)
    return out


def create_sharded_train_state(key: jax.Array, cfg: TrainConfig, mesh=None) -> Tuple[Any, TrainState]:
    mesh = mesh or make_mesh()
    state = create_train_state(key, cfg)
    state = replicate(mesh, state)
    return mesh, state


def sharded_train_step(mesh, state: TrainState, batch, key: jax.Array,
                       cfg: TrainConfig, grid=None):
    """One data-parallel step: inputs are placed, then the jitted step runs;
    XLA propagates shardings and inserts the gradient all-reduce. ``grid``
    (accel.OccupancyGrid) is replicated to every device."""
    batch = shard_batch(mesh, batch)
    if grid is not None:
        grid = jax.device_put(grid, replicated_sharding(mesh))
    return train_step(state, batch, key, cfg, grid)
