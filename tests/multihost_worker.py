"""Worker process for the real multi-process multihost test.

Launched N times by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment (the env-driven path
of parallel/multihost.py::initialize). Renders a small image with
render_image_multihost; process 0 writes the gathered image to $OUT_NPY.
"""

import os
import sys

import jax

if __name__ == "__main__":
    # Worker-process only: pytest imports this module for its helpers
    # (test_camera/train_batch) and must NOT have its platform flipped.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from nerf_rs_tpu.config import RenderConfig  # noqa: E402
from nerf_rs_tpu.models.mlp import init_nerf_params  # noqa: E402
from nerf_rs_tpu.ops.rays import Camera  # noqa: E402
from nerf_rs_tpu.parallel import multihost  # noqa: E402


def test_camera() -> Camera:
    return Camera(
        position=np.asarray([0.0, 0.0, 4.0], np.float32),
        forward=np.asarray([0.0, 0.0, -1.0], np.float32),
        up=np.asarray([0.0, 1.0, 0.0], np.float32),
        alpha_width=np.float32(0.4),
        alpha_height=np.float32(0.4),
        near=np.float32(2.0),
        far=np.float32(6.0),
    )


def train_batch(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return {
        "origins": np.zeros((n, 3), np.float32),
        "dirs": dirs,
        "rgb": rng.uniform(size=(n, 3)).astype(np.float32),
        "near": np.float32(2.0),
        "far": np.float32(6.0),
    }


def _render_mode(pid: int) -> None:
    params_c = init_nerf_params(jax.random.key(0))
    params_f = init_nerf_params(jax.random.key(1))
    cfg = RenderConfig(n_coarse=8, n_fine=16, ray_chunk=128)
    img = multihost.render_image_multihost(
        params_c, params_f, test_camera(), 16, 16, jax.random.key(2), cfg
    )
    if pid == 0:
        assert img is not None and img.shape == (16, 16, 3)
        np.save(os.environ["OUT_NPY"], img)
    else:
        assert img is None


def _train_mode(pid: int) -> None:
    from nerf_rs_tpu.config import TrainConfig
    from nerf_rs_tpu.parallel.train_sharded import (
        create_sharded_train_state, sharded_train_step,
    )

    cfg = TrainConfig(
        batch_rays=64,
        render=RenderConfig(n_coarse=8, n_fine=8, ray_chunk=64),
    )
    mesh, state = create_sharded_train_state(jax.random.key(0), cfg)
    batch = train_batch(cfg.batch_rays)
    for _ in range(2):
        state, metrics = sharded_train_step(
            mesh, state, batch, jax.random.key(1), cfg
        )
    if pid == 0:
        leaves = jax.tree_util.tree_leaves(state.params)
        np.savez(
            os.environ["OUT_NPY"],
            loss=np.asarray(metrics["loss"].addressable_data(0)),
            *[np.asarray(l.addressable_data(0)) for l in leaves],
        )


def _bench_mode(pid: int) -> None:
    """Wall-clock sanity: time sharded train steps (the path with the
    cross-process grad psum) after a compile+sync warmup; pid 0 writes the
    per-step seconds. Run with 1 and 2 processes over the same 4-device
    global mesh to expose pure cross-process (Gloo) overhead."""
    import time

    from nerf_rs_tpu.config import TrainConfig
    from nerf_rs_tpu.parallel.train_sharded import (
        create_sharded_train_state, sharded_train_step,
    )

    cfg = TrainConfig(
        batch_rays=256,
        render=RenderConfig(n_coarse=8, n_fine=8, ray_chunk=256),
    )
    mesh, state = create_sharded_train_state(jax.random.key(0), cfg)
    batch = train_batch(cfg.batch_rays)
    state, metrics = sharded_train_step(mesh, state, batch, jax.random.key(1), cfg)
    np.asarray(metrics["loss"].addressable_data(0))  # compile + sync
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        state, metrics = sharded_train_step(
            mesh, state, batch, jax.random.fold_in(jax.random.key(1), i), cfg
        )
        np.asarray(metrics["loss"].addressable_data(0))
        times.append(time.perf_counter() - t0)
    if pid == 0:
        np.save(os.environ["OUT_NPY"], np.asarray(times))


def main() -> int:
    expect_multi = int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1
    assert multihost.initialize() is expect_multi, \
        "distributed runtime did not come up as requested"
    pid = jax.process_index()
    nproc = jax.process_count()
    print(f"[worker {pid}] procs={nproc} local_devices={jax.local_device_count()}"
          f" global_devices={jax.device_count()}", flush=True)

    mode = os.environ.get("WORKER_MODE", "render")
    if mode == "train":
        _train_mode(pid)
    elif mode == "bench":
        _bench_mode(pid)
    else:
        _render_mode(pid)
    return 0


if __name__ == "__main__":
    sys.exit(main())
