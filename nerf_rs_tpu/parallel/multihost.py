"""Multi-host runtime setup.

The reference has no multi-process capability (SURVEY.md §2: rayon threads
only). Here, scaling past one host is JAX's distributed runtime: every host
calls `initialize()` before touching devices; XLA then runs collectives
over ICI within a slice and DCN across hosts with the same mesh code used
on one chip (parallel/mesh.py builds the mesh from `jax.devices()`, which
is already global after initialization).

Rendering multi-host: each host renders the ray shards of ITS devices
(render_sharded works unchanged — shard_map addresses the global mesh) and
`gather_image_shards` assembles host-local pixels for the writer, the
analogue of the reference's scatter into the flat image (lib.rs:552-557).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime (idempotent, env-var driven).

    Arguments default to $JAX_COORDINATOR_ADDRESS / $JAX_NUM_PROCESSES /
    $JAX_PROCESS_ID (also understands TPU pod env detection when args and
    env are absent, via jax.distributed.initialize's auto mode). Returns
    True when a multi-process runtime is active.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"]) if "JAX_NUM_PROCESSES" in os.environ else None
    )
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in os.environ else None
    )
    if coordinator_address is None and num_processes is None:
        return jax.process_count() > 1  # single-process (or already auto-init)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def process_ray_slice(n_rays: int) -> slice:
    """The contiguous slice of the global ray axis owned by this process
    (rays are laid out process-major, matching mesh.make_mesh over
    jax.devices() order)."""
    per = -(-n_rays // jax.process_count())
    lo = min(per * jax.process_index(), n_rays)
    return slice(lo, min(lo + per, n_rays))


def gather_image_shards(local_pixels: np.ndarray, n_rays: int) -> Optional[np.ndarray]:
    """Host-gather pixel shards to process 0 (None elsewhere).

    Uses jax's cross-process allgather on host data; single-process input
    is returned unchanged.
    """
    if jax.process_count() == 1:
        return local_pixels[:n_rays]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local_pixels)
    full = np.concatenate([np.asarray(g) for g in gathered], axis=0)[:n_rays]
    return full if jax.process_index() == 0 else None


def local_ray_rows(rgb_flat) -> np.ndarray:
    """Host-local rows of a P("rays")-sharded global array, in global row
    order (shards sorted by their global row offset)."""
    shards = sorted(rgb_flat.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def render_image_multihost(
    params_coarse,
    params_fine,
    camera,
    height: int,
    width: int,
    key,
    cfg=None,
    grid=None,
) -> Optional[np.ndarray]:
    """Multi-process render: every process executes the same global
    shard_map program over the global mesh (its devices compute their ray
    shards), then host-gathers pixels to process 0.

    Returns the (height, width, 3) image on process 0, None elsewhere —
    the analogue of the reference's rayon scatter into one flat image
    (lib.rs:552-557), with hosts in place of threads. Bitwise identical
    to render.render_image on one device (global-ray-index RNG streams).
    In a single-process runtime it degrades to render_image_sharded.
    """
    from nerf_rs_tpu.parallel.render_sharded import render_flat_sharded

    rgb_flat, n = render_flat_sharded(
        params_coarse, params_fine, camera, height, width, key, cfg,
        grid=grid,
    )
    local = local_ray_rows(rgb_flat)
    full = gather_image_shards(local, n)
    return None if full is None else full.reshape(height, width, 3)
