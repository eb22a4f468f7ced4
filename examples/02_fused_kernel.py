"""The fused Pallas MLP kernel vs the pure-JAX oracle.

Runs both implementations on the same random batch, reports max deviation
and throughput. On TPU the kernel runs via Mosaic (~125 TFLOP/s useful at
bf16); on CPU it runs in interpret mode (slow — small batch by default).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None, help="batch size (points)")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from nerf_rs_tpu.models.mlp import init_nerf_params, nerf_mlp
    from nerf_rs_tpu.ops.kernels.fused_mlp import fused_nerf_mlp

    on_tpu = jax.default_backend() == "tpu"
    n = args.n or (1 << 20 if on_tpu else 1 << 10)

    params = init_nerf_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-4, 4, size=(n, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    rgb_o, sig_o = nerf_mlp(params, pts, dirs)
    fused = jax.jit(lambda p, x, d: fused_nerf_mlp(p, x, d, dtype=args.dtype))
    rgb_k, sig_k = fused(params, pts, dirs)
    print(f"max |rgb - oracle|   = {np.abs(np.asarray(rgb_k - rgb_o)).max():.2e}")
    print(f"max |sigma - oracle| = {np.abs(np.asarray(sig_k - sig_o)).max():.2e}")

    if on_tpu:
        np.asarray(fused(params, pts, dirs)[0])          # warm the cache
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = fused(params, pts, dirs)
        np.asarray(out[0])                               # force completion
        dt = (time.perf_counter() - t0) / reps
        flops = 2 * 595_000 * n                          # ~2*params*batch
        print(f"{n} samples in {dt * 1e3:.2f} ms = {n / dt / 1e6:.0f} M samples/s"
              f" ~ {flops / dt / 1e12:.0f} TFLOP/s")


if __name__ == "__main__":
    main()
