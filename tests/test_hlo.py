"""Compiled-HLO structure checks — the collective layout the design
promises (SURVEY.md §7 step 5, scaling-book recipe):

- sharded render: rays data-parallel, params replicated => ZERO
  collectives in the compiled program (any collective would mean an
  accidental resharding riding ICI for nothing);
- data-parallel train step: exactly ONE all-reduce — XLA's combiner must
  fuse all 52 per-leaf gradient psums into a single tuple all-reduce
  (52 sequential ~KB all-reduces would be latency-bound on ICI).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_rs_tpu.config import RenderConfig, TrainConfig
from nerf_rs_tpu.models.mlp import init_nerf_params
from nerf_rs_tpu.parallel.mesh import make_mesh

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter")


def _collective_ops(hlo_text: str):
    """Actual collective *ops* (rhs of an assignment, possibly with a
    tuple result type containing spaces), not metadata mentions."""
    pat = re.compile(
        r"= .*?\b(" + "|".join(COLLECTIVES) + r")(?:-start)?\(")
    ops = []
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if m:
            ops.append(m.group(1))
    return ops


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8])


def test_sharded_render_has_zero_collectives(mesh8):
    from nerf_rs_tpu.parallel.render_sharded import _render_flat_sharded

    cfg = RenderConfig(n_coarse=8, n_fine=16, ray_chunk=128)
    pc = init_nerf_params(jax.random.key(0))
    pf = init_nerf_params(jax.random.key(1))
    n_per_dev = 128
    dirs = jnp.ones((n_per_dev * 8, 3), jnp.float32)
    txt = _render_flat_sharded.lower(
        pc, pf, jnp.zeros(3), dirs, jnp.float32(2.0), jnp.float32(6.0),
        jax.random.key(0), n_per_dev, cfg, mesh8,
    ).compile().as_text()
    ops = _collective_ops(txt)
    assert ops == [], f"sharded render compiled with collectives: {ops}"


@pytest.mark.parametrize("with_grid", [False, True],
                         ids=["dense", "accel"])
def test_train_step_has_one_fused_all_reduce(mesh8, with_grid):
    """The shard_map train step compiles to EXACTLY one all-reduce (the
    fused grads+metrics pmean) — in particular the accel path must stay
    all-gather-free: compact_apply's cumsum/scatter over a globally
    flattened sample axis is not partitionable, and the pre-shard_map
    design compiled to 6 all-gathers that replicated the whole MLP batch
    onto every chip."""
    from nerf_rs_tpu.accel import OccupancyGrid
    from nerf_rs_tpu.parallel.mesh import replicated_sharding
    from nerf_rs_tpu.parallel.train_sharded import (
        _sharded_step, create_sharded_train_state, shard_batch,
    )

    tc = TrainConfig(batch_rays=64,
                     render=RenderConfig(n_coarse=8, n_fine=8, ray_chunk=64))
    mesh, state = create_sharded_train_state(jax.random.key(0), tc)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = shard_batch(mesh, {
        "origins": np.zeros((64, 3), np.float32), "dirs": d,
        "rgb": rng.uniform(size=(64, 3)).astype(np.float32),
        "near": np.float32(2.0), "far": np.float32(6.0),
    })
    if with_grid:
        grid = OccupancyGrid(occ=jnp.ones((8, 8, 8), bool),
                             aabb_min=jnp.full((3,), -6.5, jnp.float32),
                             aabb_max=jnp.full((3,), 6.5, jnp.float32))
        grid = jax.device_put(grid, replicated_sharding(mesh))
    else:
        grid = jnp.zeros((), jnp.float32)
    txt = _sharded_step.lower(
        mesh, state, batch, jax.random.key(1), tc, grid,
        64 // mesh.devices.size, with_grid).compile().as_text()
    ops = _collective_ops(txt)
    assert ops == ["all-reduce"], (
        f"expected exactly ONE fused all-reduce, compiled {ops}")


def test_sharded_accel_aabb_render_has_zero_collectives(mesh8):
    """The AABB/probe range math (occupied_aabb reductions over the
    replicated grid + per-ray slab/probe work) must stay device-local —
    any collective would mean the clamp accidentally resharded."""
    from nerf_rs_tpu.accel import OccupancyGrid
    from nerf_rs_tpu.parallel.mesh import replicated_sharding
    from nerf_rs_tpu.parallel.render_sharded import _render_flat_sharded

    cfg = RenderConfig(n_coarse=8, n_fine=16, ray_chunk=128,
                       accel_sample_aabb=True, accel_aabb_probes=32)
    pc = init_nerf_params(jax.random.key(0))
    pf = init_nerf_params(jax.random.key(1))
    grid = OccupancyGrid(occ=jnp.ones((8, 8, 8), bool),
                         aabb_min=jnp.full((3,), -2.0, jnp.float32),
                         aabb_max=jnp.full((3,), 2.0, jnp.float32))
    grid = jax.device_put(grid, replicated_sharding(mesh8))
    n_per_dev = 128
    dirs = jnp.ones((n_per_dev * 8, 3), jnp.float32)
    txt = _render_flat_sharded.lower(
        pc, pf, jnp.zeros(3), dirs, jnp.float32(2.0), jnp.float32(6.0),
        jax.random.key(0), n_per_dev, cfg, mesh8, grid=grid,
    ).compile().as_text()
    ops = _collective_ops(txt)
    assert ops == [], f"accel+aabb sharded render compiled collectives: {ops}"


def test_hashgrid_sharded_render_has_zero_collectives(mesh8):
    """The hash family under shard_map: table gathers index REPLICATED
    tables with device-local ray data — the compiled program must contain
    no collective (a gather that resharded the (L*T, F) table across
    devices would ride ICI on every sample batch)."""
    from nerf_rs_tpu.config import HashGridConfig
    from nerf_rs_tpu.models.hashgrid import init_hashgrid_params
    from nerf_rs_tpu.parallel.render_sharded import _render_flat_sharded

    hcfg = HashGridConfig(levels=4, table_log2=12, res_min=4, res_max=32)
    cfg = RenderConfig(n_coarse=8, n_fine=16, ray_chunk=128,
                       model="hashgrid", hash=hcfg)
    params = init_hashgrid_params(jax.random.key(0), hcfg)
    n_per_dev = 128
    dirs = jnp.ones((n_per_dev * 8, 3), jnp.float32)
    txt = _render_flat_sharded.lower(
        params, params, jnp.zeros(3), dirs, jnp.float32(2.0),
        jnp.float32(6.0), jax.random.key(0), n_per_dev, cfg, mesh8,
    ).compile().as_text()
    ops = _collective_ops(txt)
    assert ops == [], f"hashgrid sharded render compiled with collectives: {ops}"


def test_hashgrid_train_step_has_one_fused_all_reduce(mesh8):
    """Data-parallel hashgrid training: the 16.8M-entry table gradient and
    the tiny MLP gradients must still fuse into EXACTLY one all-reduce."""
    from nerf_rs_tpu.config import HashGridConfig
    from nerf_rs_tpu.parallel.train_sharded import (
        _sharded_step, create_sharded_train_state, shard_batch,
    )

    hcfg = HashGridConfig(levels=4, table_log2=12, res_min=4, res_max=32)
    tc = TrainConfig(batch_rays=64, adam_eps=1e-15,
                     render=RenderConfig(n_coarse=8, n_fine=8, ray_chunk=64,
                                         model="hashgrid", hash=hcfg))
    mesh, state = create_sharded_train_state(jax.random.key(0), tc)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = shard_batch(mesh, {
        "origins": np.zeros((64, 3), np.float32), "dirs": d,
        "rgb": rng.uniform(size=(64, 3)).astype(np.float32),
        "near": np.float32(2.0), "far": np.float32(6.0),
    })
    txt = _sharded_step.lower(
        mesh, state, batch, jax.random.key(1), tc,
        jnp.zeros((), jnp.float32), 64 // mesh.devices.size, False,
    ).compile().as_text()
    ops = _collective_ops(txt)
    assert ops == ["all-reduce"], (
        f"expected exactly ONE fused all-reduce, compiled {ops}")
