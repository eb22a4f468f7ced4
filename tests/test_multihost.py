"""Real multi-process multihost runtime test.

Spawns 2 OS processes (2 virtual CPU devices each -> a 4-device global
mesh), each running tests/multihost_worker.py: distributed initialize via
env vars, a global shard_map render, and a host gather of the pixel shards
to process 0. The gathered image must equal the single-process
render_image bitwise (global-ray-index RNG streams make renders placement
invariant). This is the cross-process analogue the reference cannot do at
all (rayon threads only, lib.rs:474-565)."""

import os
import socket
import subprocess
import sys

import numpy as np



def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single(tmp_path):
    out = str(tmp_path / "img.npy")
    port = _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "OUT_NPY": out,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker],
            env={**env_base, "JAX_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text}"

    img = np.load(out)

    # Single-process oracle with identical params/camera/key/config.
    import jax

    from nerf_rs_tpu.models.mlp import init_nerf_params
    from nerf_rs_tpu.render import render_image
    from tests.multihost_worker import test_camera as make_camera
    from nerf_rs_tpu.config import RenderConfig

    ref = np.asarray(render_image(
        init_nerf_params(jax.random.key(0)), init_nerf_params(jax.random.key(1)),
        make_camera(), 16, 16, jax.random.key(2),
        RenderConfig(n_coarse=8, n_fine=16, ray_chunk=128),
    ))
    np.testing.assert_array_equal(img, ref)
