"""Worker process for the real multi-process multihost test.

Launched N times by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment (the env-driven path
of parallel/multihost.py::initialize). Renders a small image with
render_image_multihost; process 0 writes the gathered image to $OUT_NPY.
"""

import os
import sys

import jax

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


def main() -> int:
    assert multihost.initialize() is True, "expected a multi-process runtime"
    pid = jax.process_index()
    nproc = jax.process_count()
    print(f"[worker {pid}] procs={nproc} local_devices={jax.local_device_count()}"
          f" global_devices={jax.device_count()}", flush=True)

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
    return 0


if __name__ == "__main__":
    sys.exit(main())
