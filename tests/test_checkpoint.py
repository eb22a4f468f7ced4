"""Checkpoint/resume (SURVEY.md §5: the reference has no saving; training
here must round-trip params + optimizer state + step and export back to the
reference's .bin format)."""

import jax
import numpy as np

from nerf_rs_tpu.config import RenderConfig, TrainConfig
from nerf_rs_tpu.io.checkpoint import (
    export_reference_format,
    import_reference_format,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from nerf_rs_tpu.train import create_train_state

CFG = TrainConfig(batch_rays=32, render=RenderConfig(n_coarse=4, n_fine=8, ray_chunk=32))


def _tree_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip(tmp_path):
    state = create_train_state(jax.random.key(0), CFG)
    state = state._replace(step=state.step + 7)
    path = save_checkpoint(tmp_path / "ckpts", state)
    assert latest_checkpoint(tmp_path / "ckpts") == path

    template = create_train_state(jax.random.key(1), CFG)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 7
    _tree_equal(restored.params, state.params)
    _tree_equal(restored.opt_state, state.opt_state)


def test_checkpoint_prune_keeps_latest(tmp_path):
    state = create_train_state(jax.random.key(0), CFG)
    for step in (1, 2, 3, 4, 5):
        state = state._replace(step=jax.numpy.asarray(step))
        save_checkpoint(tmp_path / "c", state, keep=2)
    steps = sorted(p.name for p in (tmp_path / "c").glob("step_*"))
    assert steps == ["step_00000004", "step_00000005"]


def test_reference_format_export_import(tmp_path):
    """Params exported to shapes.txt + .bin re-import bit-identically — a
    reference-renderer user can consume TPU-trained checkpoints."""
    state = create_train_state(jax.random.key(2), CFG)
    export_reference_format(tmp_path / "weights", state.params)
    assert (tmp_path / "weights" / "coarse" / "shapes.txt").exists()
    back = import_reference_format(tmp_path / "weights")
    _tree_equal(back, state.params)
