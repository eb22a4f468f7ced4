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


def test_train_step_has_one_fused_all_reduce(mesh8):
    from nerf_rs_tpu.parallel.train_sharded import (
        create_sharded_train_state, shard_batch,
    )
    from nerf_rs_tpu.train import train_step

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
    txt = jax.jit(train_step, static_argnames=("cfg",)).lower(
        state, batch, jax.random.key(1), tc).compile().as_text()
    ops = _collective_ops(txt)
    assert all(o.startswith("all-reduce") for o in ops), ops
    n = len([o for o in ops if o.startswith("all-reduce")])
    assert n == 1, (
        f"expected ONE fused gradient all-reduce, compiled {n}: "
        "XLA's combiner stopped fusing the per-leaf psums")
