"""Sinusoidal positional encoding.

Replicates the reference scheme exactly (positional_encoding_batch,
/root/reference/src/network.rs:263-292): identity triple first, then per
frequency band a sin-triple followed by a cos-triple; frequencies start at
1.0 and double per band — **no pi factor**. Output feature count is
``3 + 6 * num_freqs`` (63 for points at L=10, 27 for view dirs at L=4).
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """gamma(x) for (..., 3) inputs -> (..., 3 + 6*num_freqs).

    Feature order per the reference: [x, y, z,
    sin(1*x), sin(1*y), sin(1*z), cos(1*x), cos(1*y), cos(1*z),
    sin(2*x), ..., cos(2^{L-1}*z)].
    """
    if num_freqs == 0:
        return x
    freqs = (2.0 ** jnp.arange(num_freqs, dtype=x.dtype))  # 1, 2, 4, ...
    scaled = x[..., None, :] * freqs[:, None]  # (..., L, 3)
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)  # (..., L, 2, 3)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 6)
    return jnp.concatenate([x, enc], axis=-1)


def encoded_dim(num_freqs: int) -> int:
    return 3 + 6 * num_freqs
