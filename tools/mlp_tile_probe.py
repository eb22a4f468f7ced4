"""Fused-MLP kernel efficiency A/B: tile width x interleave, fwd + bwd.

The dense frame is 95-98% MLP-bound (docs/PERF.md round-4 profile) and
the kernel's honest device rate is ~98 TFLOP/s vs the ~160 TFLOP/s
measured XLA matmul ceiling — kernel efficiency is the ONLY dense-path
headroom left. This sweeps the two knobs the kernel exposes
($NERF_FUSED_TILE, $NERF_FUSED_INTERLEAVE; bwd: $NERF_FUSED_BWD_TILE)
at the production fine shape, timed with the in-loop scalar-readback
method (the only honest one on the tunneled backend).

Usage: python tools/mlp_tile_probe.py [fwd|bwd|all] [weights_dir] [S]

weights_dir (default: the pretrained fine network) selects the arch —
pass assets/trained/student128_30db/fine to probe the student-128
kernel, whose measured rate (31.7 ms for 16384x64 ~ 10 TFLOP/s,
tools/profile_sp.py 2026-08-20) is ~10x off the teacher kernel's
98 TFLOP/s per-FLOP rate. S = samples/ray (default 192).
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
    what = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    a = find_lego_assets()
    wdir = _sys.argv[2] if len(_sys.argv) > 2 else str(a / "fine")
    S = int(_sys.argv[3]) if len(_sys.argv) > 3 else 192
    pf = load_nerf_params(wdir)
    n_params = sum(int(np.prod(l["kernel"].shape)) + l["bias"].shape[0]
                   for l in jax.tree_util.tree_leaves(
                       pf, is_leaf=lambda x: isinstance(x, dict) and "kernel" in x))
    PARAM_FLOPS = 2 * n_params
    print(f"arch from {wdir}: {n_params} params, {N}x{S} samples")
    dirs = jax.random.normal(jax.random.key(1), (N, 3))
    dirs = jax.device_put(dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True))
    t = jnp.linspace(2.0, 6.0, S)
    pts = jax.device_put(
        jnp.asarray([-0.05, 3.85, 1.2]) + dirs[:, None, :] * t[None, :, None])
    d3 = dirs[:, None, :]

    if what in ("fwd", "all"):
        print(f"[fwd] fine shape {N}x{S}, bf16 "
              f"(baseline tile=1024 interleave=0)", flush=True)
        for tile in (512, 1024, 2048, 4096):
            for il in ("0", "1"):
                _os.environ["NERF_FUSED_TILE"] = str(tile)
                _os.environ["NERF_FUSED_INTERLEAVE"] = il

                def fwd(z):
                    rgb, sig = FM.fused_nerf_mlp(pf, pts + z, d3,
                                                 dtype="bfloat16")
                    return (jnp.sum(rgb.astype(jnp.float32))
                            + jnp.sum(sig.astype(jnp.float32)))

                try:
                    dt = device_time(fwd)
                    print(f"  tile {tile:5d} il {il}: {dt*1e3:7.2f} ms  "
                          f"{N*S/dt/1e6:7.1f} M samp/s  "
                          f"{PARAM_FLOPS*N*S/dt/1e12:6.1f} TFLOP/s", flush=True)
                except Exception as e:
                    print(f"  tile {tile:5d} il {il}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    if what in ("fwd", "all"):
        # XLA-oracle comparison at the same shape: if plain XLA beats the
        # fused kernel for this arch, the kernel's tiling is wrong for it.
        from nerf_rs_tpu.models.mlp import nerf_mlp

        pf16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), pf)

        def xla_fwd(z):
            rgb, sig = nerf_mlp(pf16, (pts + z).astype(jnp.bfloat16),
                                d3.astype(jnp.bfloat16))
            return (jnp.sum(rgb.astype(jnp.float32))
                    + jnp.sum(sig.astype(jnp.float32)))

        try:
            dt = device_time(xla_fwd)
            print(f"  XLA oracle    : {dt*1e3:7.2f} ms  "
                  f"{N*S/dt/1e6:7.1f} M samp/s  "
                  f"{PARAM_FLOPS*N*S/dt/1e12:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"  XLA oracle    : FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    if what in ("bwd", "all"):
        _os.environ["NERF_FUSED_TILE"] = "1024"
        _os.environ["NERF_FUSED_INTERLEAVE"] = "0"
        print(f"[bwd] fine shape {N}x{S}, bf16 value_and_grad "
              f"(baseline bwd tile: dtype-chosen)", flush=True)
        for bt in (128, 256, 512, 1024):
            _os.environ["NERF_FUSED_BWD_TILE"] = str(bt)

            def loss(p, z):
                rgb, sig = FM.fused_nerf_mlp(p, pts + z, d3, dtype="bfloat16")
                return (jnp.sum(rgb.astype(jnp.float32)) * 1e-6
                        + jnp.sum(sig.astype(jnp.float32)) * 1e-6)

            def step(z):
                g = jax.grad(loss)(pf, z)
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree_util.tree_leaves(g))

            try:
                dt = device_time(step, reps=4)
                # fwd+bwd = ~4x fwd FLOPs (recompute-in-bwd design)
                print(f"  bwd tile {bt:5d}: {dt*1e3:7.2f} ms  "
                      f"{4*PARAM_FLOPS*N*S/dt/1e12:6.1f} TFLOP/s(eq)",
                      flush=True)
            except Exception as e:
                print(f"  bwd tile {bt:5d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
