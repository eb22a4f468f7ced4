"""XLA gather-throughput study on the live backend (TPU v5e or CPU).

The hash-grid family's speed is set by row gathers from the stacked
feature table (models/hashgrid.py): ~128 gathered rows per sample point
at the paper config (L=16 levels x 8 corners), each row only F=2
elements wide. TPU v5e has no SparseCore — XLA lowers row gathers to a
vector path whose efficiency depends strongly on the row width. This
study measures jnp.take rows/s and effective GB/s across (table rows T,
row width F, index count N) so the family's TPU preset (L, F trade at
fixed L*F encoding width) is chosen from data, not vibes.

Run: python tools/gather_study.py  (takes the TPU client flock itself).
Prints one JSON line per config.
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

    _lock = _acquire_tpu_lock()  # noqa: F841 — held until exit

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"# backend: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)

    N = 1 << 22  # 4M gathered rows per measurement
    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))

    # Keep the lock-hold short (the measurement chain's legs wait on the
    # same flock): the full F sweep only at the family's current T=2^17;
    # spot checks at small/large T for the width winner and the baseline.
    configs = ([(1 << 17, F) for F in (2, 8, 32, 64, 128)]
               + [(1 << 14, 2), (1 << 14, 64), (1 << 21, 2), (1 << 21, 64)])
    for T, F in configs:
            key = jax.random.key(0)
            table = jax.device_put(
                jax.random.normal(key, (T, F), jnp.bfloat16))
            idx = jax.device_put(
                jax.random.randint(jax.random.key(1), (N,), 0, T, jnp.int32))
            np.asarray(take(table, idx))  # compile + warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(take(table, idx))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            # Host-transfer of the (N, F) result rides the tunnel — time a
            # second variant that reduces on-device so the transfer is 1
            # scalar (the honest device-side number).
            take_sum = jax.jit(
                lambda t, i: jnp.take(t, i, axis=0).astype(jnp.float32).sum())
            float(take_sum(table, idx))
            times2 = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(take_sum(table, idx))
                times2.append(time.perf_counter() - t0)
            dt2 = min(times2)
            rows_s = N / dt2
            print(json.dumps({
                "T": T, "F": F, "N": N,
                "rows_per_s": round(rows_s),
                "eff_GBps": round(rows_s * F * 2 / 1e9, 2),
                "t_full_transfer_s": round(dt, 4),
                "t_device_reduce_s": round(dt2, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
