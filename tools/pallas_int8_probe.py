"""Probe: Mosaic int8 matmul rate vs bf16 on the live TPU.

Context (sweep 2026-08-19): the XLA int8 render path measured 77.8 K
rays/s vs 298 K for the fused bf16 kernel — per-row quantize VPU passes
and HBM activation round-trips swamp the MXU int8 gain. Int8 can only
pay INSIDE the fused kernel (weights resident in VMEM as int8, quantize
fused into the chain). This probe answers the go/no-go questions:

  1. does `lax.dot_general(int8, int8) -> int32` lower through Mosaic?
  2. at what rate vs the same-shape bf16 dot (nominal 394 vs 197 T)?

Shapes mirror the fused kernel's trunk matmul: (256, 256) x (256, T)
tiles, T=1024, chained DEPTH times to amortize launch overhead.

Run: python tools/pallas_int8_probe.py   (takes the TPU client flock).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _acquire_tpu_lock

    _lock = _acquire_tpu_lock()  # noqa: F841

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    dev = jax.devices()[0]
    print(f"# backend: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)

    W, T, DEPTH, STEPS = 256, 1024, 12, 64

    def make(dtype, acc_dtype, quant=False):
        def kernel(w_ref, x_ref, out_ref):
            x = x_ref[:]
            for i in range(DEPTH):
                w = w_ref[i * W:(i + 1) * W, :]
                acc = jax.lax.dot_general(
                    w, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
                if quant:
                    # The REAL int8 chain epilogue: relu in f32, dynamic
                    # per-lane (per-sample) absmax requantize back to int8.
                    h = jnp.maximum(acc.astype(jnp.float32), 0.0)
                    s = jnp.maximum(
                        jnp.max(h, axis=0, keepdims=True), 1e-6) / 127.0
                    x = jnp.round(h / s).astype(jnp.int8)
                else:
                    # Cheap epilogue back to the operand dtype (relu-ish).
                    x = jnp.maximum(acc, 0).astype(dtype)
            out_ref[:] = x.astype(jnp.float32)

        @jax.jit
        def go(w, x):
            out = pl.pallas_call(
                kernel,
                grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((DEPTH * W, W), lambda s: (0, 0)),
                    pl.BlockSpec((W, T), lambda s: (0, s)),
                ],
                out_specs=pl.BlockSpec((W, T), lambda s: (0, s)),
                out_shape=jax.ShapeDtypeStruct((W, T * STEPS), jnp.float32),
            )(w, x)
            return out.astype(jnp.float32).sum()

        return go

    import numpy as np

    for name, dtype, acc, quant in (
            ("bf16", jnp.bfloat16, jnp.float32, False),
            ("int8", jnp.int8, jnp.int32, False),
            ("int8+requant", jnp.int8, jnp.int32, True)):
        if dtype == jnp.int8:
            w = jax.random.randint(jax.random.key(0), (DEPTH * W, W),
                                   -127, 127, jnp.int8)
            x = jax.random.randint(jax.random.key(1), (W, T * STEPS),
                                   -3, 3, jnp.int8)
        else:
            w = jax.random.normal(jax.random.key(0), (DEPTH * W, W), dtype)
            x = jax.random.normal(jax.random.key(1), (W, T * STEPS), dtype)
        go = make(dtype, acc, quant)
        try:
            float(go(w, x))
        except Exception as e:
            msg = (str(e).splitlines() or ["?"])[0][:200]
            print(json.dumps({"impl": name, "error": msg}), flush=True)
            continue
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(go(w, x))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        flops = 2 * W * W * T * DEPTH * STEPS
        print(json.dumps({
            "impl": name, "t_s": round(dt, 4),
            "TOPS": round(flops / dt / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
