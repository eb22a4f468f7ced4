"""Probe: Mosaic dynamic_gather as a VMEM table-row gather (hash encode).

The hash-grid family is gather-bound: XLA's TPU lowering does ~125M
gathered rows/s regardless of row width or table size
(tools/gather_study.py, v5e 2026-08-19) — ~7.5 cycles/row, far below
the HBM traffic floor. The stacked table is only 8-16 MB (bf16), which
fits in VMEM; Mosaic's one supported gather (lowering.py
_gather_lowering_rule) is `tpu.dynamic_gather` via take_along_axis with
indices shape == operand shape:

    out[i, j] = table[idx[i, j], j]   (axis 0; row-broadcast idx ->
                                       a row gather, T rows per call)
    out[f, n] = table[f, idx[f, n]]   (axis 1 on the transposed table —
                                       a lane gather)

Earlier forms measured/failed on v5e 2026-08-19:
  - table_ref[idx_vec, :]      -> "Cannot do int indexing on TPU"
  - jnp.take(table, idx_vec)   -> "Shape mismatch" (only the same-shape
                                   dynamic_gather pattern is lowered)

This probe times both orientations over a grid of T-row blocks (4M rows
total). Adoption into models/hashgrid.py happens only on a measured win
vs the 125M rows/s XLA baseline.

Run: python tools/pallas_gather_probe.py   (takes the TPU client flock).
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
    import numpy as np
    from jax.experimental import pallas as pl

    dev = jax.devices()[0]
    print(f"# backend: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)

    SUB = 8  # idx rows per grid step (TPU block sublane granularity)

    def kernel_rows(table_ref, idx_ref, out_ref):
        # table (T, F); idx block (8, T); out block (8, T, F).
        T, F = table_ref.shape
        for i in range(SUB):
            idx2 = jnp.broadcast_to(idx_ref[i, :][:, None], (T, F))
            out_ref[i] = jnp.take_along_axis(table_ref[:], idx2, axis=0)

    def kernel_lanes(table_ref, idx_ref, out_ref):
        # table (F, T); idx block (8, T); out block (8, F, T).
        F, T = table_ref.shape
        for i in range(SUB):
            idx2 = jnp.broadcast_to(idx_ref[i, :][None, :], (F, T))
            out_ref[i] = jnp.take_along_axis(table_ref[:], idx2, axis=1)

    def run(name, T, F, n_total=1 << 22):
        B = max(SUB, (n_total // T // SUB) * SUB)
        lanes = name == "lanes"
        tshape = (F, T) if lanes else (T, F)
        table = jax.random.normal(jax.random.key(0), tshape, jnp.bfloat16)
        idx = jax.random.randint(jax.random.key(1), (B, T), 0, T, jnp.int32)

        kernel = kernel_lanes if lanes else kernel_rows
        out_block = (F, T) if lanes else (T, F)

        @jax.jit
        def go(t, i):
            out = pl.pallas_call(
                kernel,
                grid=(B // SUB,),
                in_specs=[
                    pl.BlockSpec(tshape, lambda b: (0, 0)),
                    pl.BlockSpec((SUB, T), lambda b: (b, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (SUB, *out_block), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, *out_block), jnp.bfloat16),
            )(t, i)
            return out.astype(jnp.float32).sum()

        try:
            float(go(table, idx))
        except Exception as e:
            msg = (str(e).splitlines() or ["?"])[0][:200]
            print(json.dumps({"impl": name, "T": T, "F": F, "error": msg}),
                  flush=True)
            return
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(go(table, idx))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rows = B * T
        print(json.dumps({
            "impl": name, "T": T, "F": F, "rows": rows,
            "rows_per_s": round(rows / dt),
            "eff_GBps": round(rows / dt * F * 2 / 1e9, 2),
        }), flush=True)

    for T, F in ((131072, 2), (131072, 8), (8192, 128)):
        run("rows", T, F)
        run("lanes", T, F)


if __name__ == "__main__":
    main()
