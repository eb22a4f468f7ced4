"""Profile the render pipeline stage-by-stage on the real TPU.

Times: fused MLP alone (coarse-shaped and fine-shaped batches), sampling /
weights / sort ops alone, and the full hierarchical render. Prints a table
plus effective TFLOP/s so we can see how far each piece is from the v5e
~197 TFLOP/s bf16 roofline.
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
from nerf_rs_tpu.ops.kernels.fused_mlp import fused_nerf_mlp
from nerf_rs_tpu.ops.sampling import importance_samples, merge_samples, stratified_samples
from nerf_rs_tpu.ops.volume import composite, compute_weights
from nerf_rs_tpu.render import render_image


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force host sync on axon
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return min(times)


MACS_PER_SAMPLE = 593_408  # full network, unpadded


def main():
    assets = find_lego_assets()
    if assets is None:
        raise SystemExit("pretrained lego assets not found "
                         "(set $NERF_RS_TPU_ASSETS)")
    params_c = load_nerf_params(assets / "coarse")
    params_f = load_nerf_params(assets / "fine")
    camera = camera_from_golden(load_golden(assets / "tf_reference_samples.json"))
    key = jax.random.key(0)

    n_rays = 16384
    nc, nf = 64, 128
    dirs = jax.random.normal(jax.random.key(1), (n_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = jnp.asarray([-0.0538, 3.8455, 1.2081], jnp.float32)
    near, far = jnp.float32(2.0), jnp.float32(6.0)

    for dtype in ("bfloat16",):
        # --- MLP alone, fine-shaped batch (n_rays, nc+nf samples)
        pts = origin + dirs[:, None, :] * jnp.linspace(2.0, 6.0, nc + nf)[None, :, None]
        mlp = jax.jit(lambda p, x, d: fused_nerf_mlp(p, x, d, dtype=dtype))
        t = timeit(mlp, params_f, pts, dirs[:, None, :])
        n_samp = n_rays * (nc + nf)
        tflops = 2 * MACS_PER_SAMPLE * n_samp / t / 1e12
        print(f"[{dtype}] fused MLP fine batch ({n_samp} samples): {t*1e3:.2f} ms "
              f"-> {tflops:.1f} TFLOP/s useful, {n_samp/t/1e6:.1f} M samples/s")

        # coarse-shaped
        pts_c = pts[:, :nc]
        t = timeit(mlp, params_c, pts_c, dirs[:, None, :])
        n_samp_c = n_rays * nc
        tflops = 2 * MACS_PER_SAMPLE * n_samp_c / t / 1e12
        print(f"[{dtype}] fused MLP coarse batch ({n_samp_c} samples): {t*1e3:.2f} ms "
              f"-> {tflops:.1f} TFLOP/s useful")

    # --- sampling ops alone
    cfg = RenderConfig(n_coarse=nc, n_fine=nf, ray_chunk=n_rays, impl="pallas", dtype="bfloat16")

    @jax.jit
    def sampling_only(key):
        t_c = stratified_samples(key, near, far, nc, (n_rays,))
        sigma = jax.random.uniform(key, (n_rays, nc)) * 30.0
        w_c = compute_weights(sigma, t_c, far, t_threshold=cfg.t_threshold)
        t_extra = importance_samples(key, t_c, w_c, nf, pdf_eps=cfg.pdf_eps, cdf_eps=cfg.cdf_eps)
        t_f = merge_samples(t_c, t_extra)
        return t_f

    t = timeit(sampling_only, key)
    print(f"sampling+weights+resample+sort ({n_rays} rays): {t*1e3:.2f} ms")

    # --- full render_rays for same chunk
    from nerf_rs_tpu.render import render_rays

    @jax.jit
    def full(key):
        return render_rays(params_c, params_f, origin, dirs, near, far, key, cfg)

    t = timeit(full, key)
    print(f"full render_rays chunk ({n_rays} rays): {t*1e3:.2f} ms -> {n_rays/t/1e3:.1f} K rays/s")
    useful_tflops = 2 * MACS_PER_SAMPLE * n_rays * (nc + nc + nf) / t / 1e12
    print(f"  implied useful TFLOP/s (coarse {nc} + fine {nc+nf} samples/ray): {useful_tflops:.1f}")

    # --- hash-grid family: encoding gather alone vs full forward — the
    # HBM-gather numbers the docs/PERF.md hash roofline brackets.
    from nerf_rs_tpu.config import HashGridConfig
    from nerf_rs_tpu.models.hashgrid import hash_encode, hashgrid_mlp, init_hashgrid_params

    hcfg = HashGridConfig()
    hp = jax.device_put(init_hashgrid_params(jax.random.key(2), hcfg))
    # Quarter batch: at the MLP stages' 3.1 M samples the encode's gather
    # temporaries OOM the chip (it runs 4096-ray chunks in production).
    n_samp = n_rays * (nc + nf) // 4
    pts_flat = pts.reshape(-1, 3)[:n_samp]
    enc_fn = jax.jit(lambda tb, x: hash_encode(tb, x, hcfg))
    t = timeit(enc_fn, hp["hash_tables"], pts_flat)
    gb = n_samp * hcfg.levels * 8 * hcfg.features * 4 / 1e9  # f32 rows touched
    print(f"hash encode ({n_samp} samples, L={hcfg.levels} T=2^{hcfg.table_log2}): "
          f"{t*1e3:.2f} ms -> {n_samp/t/1e6:.1f} M samples/s, "
          f"{gb/t:.0f} GB/s gathered-row traffic")
    hmlp = jax.jit(lambda p, x, d: hashgrid_mlp(p, x, d, cfg=hcfg, dtype="bfloat16"))
    t = timeit(hmlp, hp, pts_flat,
               jnp.broadcast_to(dirs[:, None, :],
                                pts.shape).reshape(-1, 3)[:n_samp])
    print(f"hashgrid full forward ({n_samp} samples): {t*1e3:.2f} ms "
          f"-> {n_samp/t/1e6:.1f} M samples/s")

    # --- full image for reference
    t0 = time.perf_counter()
    img = render_image(params_c, params_f, camera, 800, 800, key, cfg)
    np.asarray(img)
    t_img = time.perf_counter() - t0
    print(f"full 800x800 image (incl compile): {t_img:.2f} s")
    t0 = time.perf_counter()
    img = render_image(params_c, params_f, camera, 800, 800, jax.random.fold_in(key, 1), cfg)
    np.asarray(img)
    t_img = time.perf_counter() - t0
    print(f"full 800x800 image (steady state): {t_img:.2f} s -> {800*800/t_img/1e3:.0f} K rays/s")


if __name__ == "__main__":
    main()
