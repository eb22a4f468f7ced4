"""Stage-by-stage roofline of the DENSE render path + the train step.

VERDICT r3 items 2 & 3: dense exact runs at ~46% of its own
speed-of-light (298 K vs ~650 K rays/s) and the fused MLP bounds the
MLP-only rate at ~430 K — so roughly a third of frame time is non-MLP.
This script times each pipeline stage as its own jitted program at the
production chunk shape, so we know WHICH third to attack; then it does
the same for the train step (fwd / fwd+bwd / full optimizer step) over
a batch-size sweep.

Each stage is separately jitted, so inter-stage XLA fusion is lost —
the per-stage sum slightly OVERSTATES the true total (we print the real
fused total alongside for calibration).

Usage: python tools/profile_dense.py [render|train|all]  (default all)
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.config import RenderConfig, TrainConfig
from nerf_rs_tpu.io.golden import camera_from_golden, load_golden
from nerf_rs_tpu.io.weights import find_lego_assets, load_nerf_params
from nerf_rs_tpu.ops.kernels.fused_mlp import fused_nerf_mlp
from nerf_rs_tpu.ops.sampling import (
    _batched_uniform,
    importance_samples,
    merge_samples,
    stratified_samples,
)
from nerf_rs_tpu.ops.volume import composite, compute_weights

N_RAYS = 16384
NC, NF = 64, 128


def timeit(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # axon: force host sync
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return min(times)


K_REPS = 8


def device_time(fn, *args, reps=K_REPS, repeats=3):
    """Time fn's DEVICE cost: run it ``reps`` times inside one jitted
    program (loop-carried accumulator so XLA cannot CSE or reorder the
    iterations; the loop index perturbs the float inputs by a denormal so
    each iteration is a distinct computation) and transfer ONE scalar.

    On the tunneled axon backend this is the only honest method: the
    naive per-stage timing pays a device->host transfer of the stage's
    full output through a ~30 MB/s tunnel (a 37 MB MLP output reads as
    +1.2 s), and block_until_ready returns early."""

    def perturb(a, z):
        # Thread the loop-carried accumulator into every array input:
        # z = acc * 0.0 is ZERO at runtime but NOT foldable statically
        # (float 0*x can be NaN), so each iteration depends on the last
        # and XLA can neither CSE nor hoist the body.
        if not isinstance(a, jax.Array):
            return a
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a + z.astype(a.dtype)
        if jnp.issubdtype(a.dtype, jnp.integer):
            return a + z.astype(a.dtype)
        return a  # PRNG keys etc.

    @jax.jit
    def repeated(*args):
        def body(i, acc):
            z = acc * jnp.float32(0.0)
            out = fn(*jax.tree_util.tree_map(lambda a: perturb(a, z), args))
            return acc + jax.tree_util.tree_reduce(
                lambda s, leaf: s + jnp.sum(leaf.astype(jnp.float32)),
                out, jnp.float32(0.0))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    np.asarray(repeated(*args))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(repeated(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / reps


def render_stages():
    assets = find_lego_assets()
    params_c = load_nerf_params(assets / "coarse")
    params_f = load_nerf_params(assets / "fine")
    cfg = RenderConfig(n_coarse=NC, n_fine=NF, ray_chunk=N_RAYS,
                       impl="pallas", dtype="bfloat16")
    key = jax.random.key(0)
    dirs = jax.random.normal(jax.random.key(1), (N_RAYS, 3))
    dirs = jax.device_put(dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True))
    origin = jax.device_put(jnp.asarray([-0.0538, 3.8455, 1.2081], jnp.float32))
    near, far = jnp.float32(2.0), jnp.float32(6.0)
    ray_ids = jax.device_put(jnp.arange(N_RAYS, dtype=jnp.int32))

    near_d = jax.device_put(jnp.float32(2.0))
    far_d = jax.device_put(jnp.float32(6.0))
    rows = []

    def stage(name, fn, *args):
        t = device_time(fn, *args)
        rows.append((name, t))
        print(f"  {name:<42s} {t*1e3:9.3f} ms  {N_RAYS/t/1e3:8.1f} K rays/s",
              flush=True)
        return t

    print(f"[render stages] chunk={N_RAYS} rays, {NC}+{NF} samples, "
          f"pallas/bf16, backend={jax.default_backend()}, "
          f"device-time via {K_REPS}-rep fori_loop (scalar readback)")

    # 0. per-ray RNG key derivation (both passes), as render_rays does it
    def keys(key, ids):
        kc, kf = jax.random.split(key)
        kc = jax.vmap(lambda i: jax.random.fold_in(kc, i))(ids)
        kf = jax.vmap(lambda i: jax.random.fold_in(kf, i))(ids)
        return kc, kf
    stage("per-ray fold_in keys (x2 passes)",
          lambda k, i: jax.tree.map(jax.random.key_data, keys(k, i)),
          key, ray_ids)
    kc, kf = jax.jit(keys)(key, ray_ids)
    kc, kf = jax.device_put(kc), jax.device_put(kf)

    # 1. stratified coarse samples (incl. per-ray uniform draw)
    stage("stratified_samples (coarse, per-ray keys)",
          lambda k, nr, fr: stratified_samples(k, nr, fr, NC, (N_RAYS,)),
          kc, near_d, far_d)
    t_c = jax.device_put(jax.jit(
        lambda k: stratified_samples(k, near, far, NC, (N_RAYS,)))(kc))

    # 2. coarse points + sigma-only MLP
    def coarse_mlp(t_c, dirs):
        pts = origin + dirs[:, None, :] * t_c[..., None]
        _, sigma = fused_nerf_mlp(params_c, pts, dirs[:, None, :],
                                  dtype="bfloat16", sigma_only=True)
        return sigma
    stage("coarse MLP sigma-only (64 s/ray)", coarse_mlp, t_c, dirs)
    sigma_c = jax.device_put(jax.jit(coarse_mlp)(t_c, dirs))

    # 3. weights from coarse sigma
    stage("compute_weights (coarse)",
          lambda s, t: compute_weights(s, t, far, t_threshold=cfg.t_threshold),
          sigma_c, t_c)
    w_c = jax.device_put(jax.jit(
        lambda s, t: compute_weights(s, t, far,
                                     t_threshold=cfg.t_threshold))(sigma_c, t_c))

    # 4. importance resampling (inverse CDF)
    stage("importance_samples (128 new t/ray)",
          lambda k, t, w: importance_samples(k, t, w, NF, pdf_eps=cfg.pdf_eps,
                                             cdf_eps=cfg.cdf_eps), kf, t_c, w_c)
    t_extra = jax.device_put(jax.jit(
        lambda k, t, w: importance_samples(k, t, w, NF, pdf_eps=cfg.pdf_eps,
                                           cdf_eps=cfg.cdf_eps))(kf, t_c, w_c))

    # 5. merge + sort to 192
    stage("merge_samples (sort 192/ray)", merge_samples, t_c, t_extra)
    t_f = jax.device_put(jax.jit(merge_samples)(t_c, t_extra))

    # 6. fine MLP (rgb+sigma, 192 s/ray)
    def fine_mlp(t_f, dirs):
        pts = origin + dirs[:, None, :] * t_f[..., None]
        return fused_nerf_mlp(params_f, pts, dirs[:, None, :], dtype="bfloat16")
    stage("fine MLP rgb+sigma (192 s/ray)", fine_mlp, t_f, dirs)
    rgb_f, sigma_f = jax.jit(fine_mlp)(t_f, dirs)
    rgb_f = jax.device_put(rgb_f); sigma_f = jax.device_put(sigma_f)

    # 7. fine weights + composite
    def comp(sigma_f, t_f, rgb_f):
        w = compute_weights(sigma_f, t_f, far, t_threshold=cfg.t_threshold)
        return composite(rgb_f, w, white_background=cfg.white_background)
    stage("compute_weights+composite (fine)", comp, sigma_f, t_f, rgb_f)

    total = sum(t for _, t in rows)
    print(f"  {'-- per-stage sum':<42s} {total*1e3:9.3f} ms  "
          f"{N_RAYS/total/1e3:8.1f} K rays/s")

    # the real fused program, same in-jit repetition method
    from nerf_rs_tpu.render import render_rays
    t = device_time(lambda d, i, k: render_rays(
        params_c, params_f, origin, d, near_d, far_d, k, cfg, ray_ids=i),
        dirs, ray_ids, key)
    print(f"  {'== full render_rays (fused program)':<42s} {t*1e3:9.3f} ms  "
          f"{N_RAYS/t/1e3:8.1f} K rays/s")
    mlp_sum = sum(v for n, v in rows if "MLP" in n)
    print(f"  MLP share of per-stage sum: {mlp_sum/total*100:.0f}%  "
          f"(non-MLP {total-mlp_sum:.4f}s -> "
          f"{(total-mlp_sum)/total*100:.0f}%)")


def train_stages():
    from nerf_rs_tpu.train import create_train_state, nerf_loss, train_step

    print(f"[train stages] {NC}+{NF} samples, pallas/bf16")
    for batch in (4096, 8192, 16384, 32768, 65536):
        cfg = TrainConfig(batch_rays=batch, render=RenderConfig(
            n_coarse=NC, n_fine=NF, ray_chunk=batch, impl="pallas",
            dtype="bfloat16"))
        key = jax.random.key(0)
        state = create_train_state(key, cfg)
        dirs = jax.random.normal(jax.random.key(1), (batch, 3))
        batch_data = {
            "origins": jnp.asarray([-0.05, 3.85, 1.2], jnp.float32),
            "dirs": jax.device_put(dirs / jnp.linalg.norm(dirs, axis=-1,
                                                          keepdims=True)),
            "rgb": jax.device_put(jax.random.uniform(jax.random.key(2),
                                                     (batch, 3))),
            "near": jnp.float32(2.0), "far": jnp.float32(6.0),
        }

        lossf = jax.jit(lambda p, b, k: nerf_loss(p, b, k, cfg)[0])
        gradf = jax.jit(lambda p, b, k: jax.grad(
            lambda q: nerf_loss(q, b, k, cfg)[0])(p))
        t_fwd = timeit(lossf, state.params, batch_data, key)
        t_grad = timeit(gradf, state.params, batch_data, key)

        # train_step donates the state, so time a CHAIN of steps (steady-
        # state throughput — exactly what training sees).
        def chain(state, n=8):
            for i in range(n):
                state, m = train_step(state, batch_data,
                                      jax.random.fold_in(key, i), cfg)
            return state, m
        s1, _ = chain(state, 1)   # compile
        jax.block_until_ready(s1)
        t0 = time.perf_counter()
        s2, m = chain(s1, 8)
        jax.block_until_ready(m)
        np.asarray(m["loss"])
        t_step = (time.perf_counter() - t0) / 8
        print(f"  batch {batch:6d}: fwd {t_fwd*1e3:8.2f} ms "
              f"({batch/t_fwd/1e3:7.1f} K rays/s) | "
              f"fwd+bwd {t_grad*1e3:8.2f} ms ({batch/t_grad/1e3:7.1f} K) | "
              f"full step {t_step*1e3:8.2f} ms ({batch/t_step/1e3:7.1f} K)")


if __name__ == "__main__":
    what = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if what in ("render", "all"):
        render_stages()
    if what in ("train", "all"):
        train_stages()
