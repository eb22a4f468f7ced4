"""Training checkpoints: orbax save/restore + reference `.bin` export.

The reference's only "checkpoint format" is the shapes.txt + raw LE-f32 .bin
directory it loads from (/root/reference/src/lib.rs:108-174); it cannot save.
Here training state (params + optimizer + step) round-trips through orbax,
and the params alone can be exported to the reference format so a
reference-renderer user can consume checkpoints trained on TPU.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from nerf_rs_tpu.io.weights import load_nerf_params, save_nerf_params


def save_checkpoint(directory, state, *, keep: int = 3) -> Path:
    """Save TrainState at <directory>/step_<N> via orbax; prunes old steps."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    step = int(state.step)
    path = directory / f"step_{step:08d}"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    steps = sorted(p for p in directory.glob("step_*") if p.is_dir())
    for old in steps[:-keep]:
        import shutil

        shutil.rmtree(old)
    return path


def latest_checkpoint(directory) -> Optional[Path]:
    directory = Path(directory)
    if not directory.is_dir():
        return None
    steps = sorted(p for p in directory.glob("step_*") if p.is_dir())
    return steps[-1] if steps else None


def restore_checkpoint(path, template):
    """Restore a TrainState saved by save_checkpoint. ``template`` is a state
    with the right structure (e.g. from create_train_state)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).absolute(), item=template)
    return restored


def checkpoint_kernel_shapes(path):
    """{layer: kernel shape} of a checkpoint's coarse net WITHOUT reading
    array data (orbax metadata only) — the cheap way to detect an
    architecture mismatch before a full templated restore."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        md = ckptr.metadata(Path(path).absolute())
    tree = md.item_metadata if hasattr(md, "item_metadata") else md
    return {layer: tuple(leaf["kernel"].shape)
            for layer, leaf in tree["params"]["coarse"].items()}


def checkpoint_param_keys(path) -> set:
    """Top-level param-subtree keys of a checkpoint ({'coarse', 'fine'} for
    the MLP family, {'shared'} for hashgrid) from orbax metadata only — the
    cheap family check before a templated restore."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        md = ckptr.metadata(Path(path).absolute())
    tree = md.item_metadata if hasattr(md, "item_metadata") else md
    return set(tree["params"].keys())


def restore_params(path):
    """Restore only ``(params, step)`` from a checkpoint, template-free.

    A raw (item-less) orbax restore returns plain nested dicts, so this
    works for ANY ArchConfig family member without knowing its shape up
    front — evaluate/export infer the architecture from the checkpoint
    instead of requiring matching --width/--depth flags. (Resuming
    *training* still goes through restore_checkpoint with a template,
    because the optimizer state must be rebuilt as optax namedtuples.)
    """
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(Path(path).absolute())
    return raw["params"], int(np.asarray(raw["step"]))


def save_model_config(directory, info: dict) -> Path:
    """Persist the model-family metadata (model name + non-inferable
    hyper-parameters, e.g. HashGridConfig's resolutions/aabb) as a
    ``model.json`` sidecar at the checkpoint ROOT. MLP-family checkpoints
    don't need one (ArchConfig is inferred from kernel shapes), hash-grid
    checkpoints do — table shapes alone don't determine the per-level
    resolutions."""
    import json

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / "model.json"
    path.write_text(json.dumps(info, indent=1))
    return path


def load_model_config(path) -> Optional[dict]:
    """Read the ``model.json`` sidecar for a checkpoint path (the step dir
    or the root dir); None when absent (pre-sidecar / MLP checkpoints)."""
    import json

    path = Path(path)
    for candidate in (path / "model.json", path.parent / "model.json"):
        if candidate.is_file():
            return json.loads(candidate.read_text())
    return None


def hashgrid_render_config(info: dict, base):
    """RenderConfig for a hash-grid checkpoint from its sidecar ``info``,
    carried over the caller's sampling/chunk knobs in ``base``."""
    from nerf_rs_tpu.config import HashGridConfig

    hash_kw = dict(info.get("hash", {}))
    if "aabb" in hash_kw:
        hash_kw["aabb"] = tuple(hash_kw["aabb"])
    return base.replace(model="hashgrid", hash=HashGridConfig(**hash_kw))


def export_reference_format(directory, params) -> None:
    """Write {coarse,fine}/ weight dirs readable by the reference renderer
    (and by our loader)."""
    directory = Path(directory)
    for net in ("coarse", "fine"):
        save_nerf_params(directory / net, params[net])


def import_reference_format(directory):
    directory = Path(directory)
    return {
        "coarse": load_nerf_params(directory / "coarse"),
        "fine": load_nerf_params(directory / "fine"),
    }
