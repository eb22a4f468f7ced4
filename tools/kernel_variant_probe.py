"""Round-5 kernel-efficiency A/B: encode-on-VPU x bf16-epilogue x tile.

The fused kernel's honest rate is ~98 TFLOP/s vs the ~160 TFLOP/s
measured XLA matmul ceiling (docs/PERF.md round-4 profile) and the dense
frame is 95-98% MLP-bound — kernel efficiency is the only dense-path
headroom. Round-5 levers under test ($NERF_FUSED_ENC / $NERF_FUSED_EPI,
fused_mlp.py):

- enc=vpu: the (128, 8) f32-HIGHEST encode matmul runs the MXU in
  multi-pass mode with a nearly-empty systolic array; the VPU rebuild
  (broadcast+select+scale, numerically exact) frees that MXU time.
- epi=bf16: MXU emits bf16 directly, bias/relu in bf16 — removes the
  per-layer f32->bf16 cast pass between dependent matmuls.

Timing: in-loop fori_loop scalar-readback (the only honest method on the
tunneled backend — wall methods overstate sub-10 ms programs by ~24 ms).

Usage: python tools/kernel_variant_probe.py [weights_dir] [S] [reps]
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.io.weights import find_lego_assets, load_nerf_params
from nerf_rs_tpu.ops.kernels import fused_mlp as FM

N = 16384


def device_time(fn, reps=8, repeats=3):
    @jax.jit
    def repeated():
        def body(i, acc):
            return acc + fn(acc * jnp.float32(0.0))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    np.asarray(repeated())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(repeated())
        times.append(time.perf_counter() - t0)
    return min(times) / reps


def main():
    a = find_lego_assets()
    wdir = _sys.argv[1] if len(_sys.argv) > 1 else str(a / "fine")
    S = int(_sys.argv[2]) if len(_sys.argv) > 2 else 192
    pf = load_nerf_params(wdir)
    n_params = sum(int(np.prod(l["kernel"].shape)) + l["bias"].shape[0]
                   for l in jax.tree_util.tree_leaves(
                       pf, is_leaf=lambda x: isinstance(x, dict) and "kernel" in x))
    PARAM_FLOPS = 2 * n_params
    print(f"arch from {wdir}: {n_params} params, {N}x{S} samples", flush=True)
    dirs = jax.random.normal(jax.random.key(1), (N, 3))
    dirs = jax.device_put(dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True))
    t = jnp.linspace(2.0, 6.0, S)
    pts = jax.device_put(
        jnp.asarray([-0.05, 3.85, 1.2]) + dirs[:, None, :] * t[None, :, None])
    d3 = dirs[:, None, :]

    # Correctness anchor once per arch: variant outputs vs baseline.
    def run_once():
        rgb, sig = FM.fused_nerf_mlp(pf, pts, d3, dtype="bfloat16")
        return rgb, sig

    base_rgb, base_sig = map(np.asarray, run_once())

    combos = []
    for tile in (1024, 2048):
        for enc in ("mxu", "vpu"):
            for epi in ("f32", "bf16"):
                combos.append((tile, enc, epi))
    for tile, enc, epi in combos:
        _os.environ["NERF_FUSED_TILE"] = str(tile)
        _os.environ["NERF_FUSED_ENC"] = enc
        _os.environ["NERF_FUSED_EPI"] = epi

        def fwd(z):
            rgb, sig = FM.fused_nerf_mlp(pf, pts + z, d3, dtype="bfloat16")
            return (jnp.sum(rgb.astype(jnp.float32))
                    + jnp.sum(sig.astype(jnp.float32)))

        try:
            rgb, sig = map(np.asarray, run_once())
            err = max(np.abs(rgb - base_rgb).max(), np.abs(sig - base_sig).max())
            dt = device_time(fwd)
            print(f"  tile {tile:5d} enc {enc} epi {epi}: {dt*1e3:7.2f} ms  "
                  f"{N*S/dt/1e6:7.1f} M samp/s  "
                  f"{PARAM_FLOPS*N*S/dt/1e12:6.1f} TFLOP/s  "
                  f"maxdiff {err:.2e}", flush=True)
        except Exception as e:
            print(f"  tile {tile:5d} enc {enc} epi {epi}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
