"""Where does the single-pass (s64x0 + probe placement) frame spend its
time? The student-128 measured 911 K rays/s at this preset (r4 chain
leg student30_s64x0_probe) while its MLP cost alone predicts >2 M —
this decomposes the 800x800 frame:

  1. the per-image ranges+sort program (_image_ray_ranges),
  2. the packed render program, over a ray_chunk sweep,
  3. the bare fused student MLP at the packed chunk shape,

all with host-sync timing (np.asarray) like bench.py. Run on TPU under
the flock; ~3 min.

Usage: python tools/profile_sp.py [weights_dir]
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import RenderConfig
from nerf_rs_tpu.io.golden import camera_from_golden, load_golden
from nerf_rs_tpu.io.weights import find_lego_assets, load_nerf_params
from nerf_rs_tpu.render import _image_ray_ranges, camera_rays, render_image

SIZE = 800


def wall(fn, repeats=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    wdir = _sys.argv[1] if len(_sys.argv) > 1 else "assets/trained/student128_30db"
    assets = find_lego_assets()
    camera = camera_from_golden(load_golden(assets / "tf_reference_samples.json"))
    from pathlib import Path

    p = Path(wdir)
    params_c = load_nerf_params(p / "coarse")
    params_f = load_nerf_params(p / "fine")

    from nerf_rs_tpu.accel import build_scene_grid

    grid = build_scene_grid(params_c, params_f, resolution=128)
    key = jax.random.key(0)
    n = SIZE * SIZE

    base = RenderConfig(n_coarse=64, n_fine=0, impl="pallas",
                        dtype="bfloat16", accel_compact="off",
                        accel_sample_aabb=True, accel_aabb_probes=128,
                        accel_range_stride=4)

    # 1. ranges + sort program
    _, dirs = camera_rays(camera, SIZE, SIZE)
    origin = jnp.asarray(camera.position)
    near, far = jnp.asarray(camera.near), jnp.asarray(camera.far)
    t = wall(lambda: _image_ray_ranges(grid, origin,
                                       dirs.reshape(SIZE, SIZE, 3),
                                       near, far, base)[0][0])
    print(f"  ranges+sort program              {t*1e3:8.1f} ms", flush=True)

    # 2. full frame over a chunk sweep
    for chunk in (16384, 32768, 65536):
        cfg = base.replace(ray_chunk=chunk)
        t = wall(lambda: render_image(params_c, params_f, camera, SIZE, SIZE,
                                      key, cfg, grid=grid))
        print(f"  full frame, chunk {chunk:6d}        {t*1e3:8.1f} ms  "
              f"{n/t/1e3:8.1f} K rays/s", flush=True)

    # 3. bare fused student MLP at chunk shape (what the frame SHOULD cost)
    from nerf_rs_tpu.ops.kernels.fused_mlp import fused_nerf_mlp

    N, S = 16384, 64
    d = jax.random.normal(jax.random.key(1), (N, 3))
    d = jax.device_put(d / jnp.linalg.norm(d, axis=-1, keepdims=True))
    ts_lin = jnp.linspace(2.0, 6.0, S)
    pts = jax.device_put(origin + d[:, None, :] * ts_lin[None, :, None])

    f = jax.jit(lambda: sum(
        jnp.sum(o.astype(jnp.float32))
        for o in fused_nerf_mlp(params_f, pts, d[:, None, :],
                                dtype="bfloat16")))
    t = wall(f)
    n_hit_chunks = 26  # ~67% of 800x800 at chunk 16384, rounded to 4
    print(f"  bare student MLP {N}x{S}       {t*1e3:8.1f} ms/chunk -> "
          f"x{n_hit_chunks} hit chunks = {t*n_hit_chunks*1e3:6.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
