"""The classic NeRF density+RGB MLP, pure-JAX reference forward.

This is the framework's numerical oracle: every fused Pallas kernel is
validated allclose against it. Architecture mirrors Network::forward_batch
(/root/reference/src/network.rs:197-237):

    h0 = gamma_10(points)                        (63)
    dense0..4 + ReLU                             (63->256, 256->256 x4)
    skip: h = concat(h0, h4)                     (319)   network.rs:210-211
    dense5..7 + ReLU                             (319->256, 256->256 x2)
    sigma  = ReLU(alpha(h8))                     (1)     network.rs:216  <- ReLU, not softplus
    b      = bottleneck(h8), no activation       (256)   network.rs:218
    q      = concat(b, gamma_4(viewdirs))        (283)   network.rs:219-220
    hv     = ReLU(viewdirs_layer(q))             (128)
    rgb    = Sigmoid(rgb_layer(hv))              (3)     network.rs:222-223

Layout difference from the reference (deliberate, TPU-first): activations are
batch-major ``(..., features)`` and layers compute ``x @ kernel + bias`` —
mathematically identical to the reference's transposed GEMM over
``(features, batch)`` columns.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_rs_tpu.io.weights import CANONICAL_SHAPES, LAYER_NAMES
from nerf_rs_tpu.models.encoding import positional_encoding


def _dense(params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    p = params[name]
    kernel = p["kernel"].astype(x.dtype)
    bias = p["bias"].astype(x.dtype)
    # HIGHEST precision: in f32 this forces true-f32 MXU passes on TPU (the
    # default would round through bf16 and miss the 1e-2 golden tolerance).
    # In bf16 compute dtype it is a no-op speed-wise.
    return jnp.dot(x, kernel, precision=jax.lax.Precision.HIGHEST) + bias


def nerf_mlp(
    params: Dict[str, Dict[str, jnp.ndarray]],
    points: jnp.ndarray,
    viewdirs: jnp.ndarray,
    *,
    x_freqs: int = 10,
    d_freqs: int = 4,
    sigma_only: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the MLP at ``points`` (..., 3) with view dirs (..., 3).

    ``viewdirs`` broadcasts against points' batch shape. Returns
    ``(rgb (..., 3), sigma (...,))``. With ``sigma_only`` the color branch
    is skipped and rgb is zeros (coarse pass discards colors, lib.rs:404).
    """
    h0 = positional_encoding(points, x_freqs)
    h = h0
    # Depth and skip placement derive from the params themselves (number of
    # dense{i} entries; a layer whose input dim exceeds the running width by
    # exactly enc_dim consumes the skip concat) — one forward serves the
    # whole ArchConfig family, canonical lego included (5 + skip + 3).
    n_dense = sum(1 for k in params if k.startswith("dense"))
    enc_dim = h0.shape[-1]
    for i in range(n_dense):
        d_in = params[f"dense{i}"]["kernel"].shape[0]
        if i > 0 and d_in == h.shape[-1] + enc_dim:
            # skip: encoded input FIRST (network.rs:210-211)
            h = jnp.concatenate([h0, h], axis=-1)
        h = jax.nn.relu(_dense(params, f"dense{i}", h))

    sigma = jax.nn.relu(_dense(params, "alpha", h))[..., 0]
    if sigma_only:
        return jnp.zeros((*sigma.shape, 3), sigma.dtype), sigma

    bottleneck = _dense(params, "bottleneck", h)
    dirs_enc = positional_encoding(viewdirs, d_freqs)
    dirs_enc = jnp.broadcast_to(dirs_enc, (*bottleneck.shape[:-1], dirs_enc.shape[-1]))
    q = jnp.concatenate([bottleneck, dirs_enc], axis=-1)  # bottleneck FIRST (network.rs:219-220)
    hv = jax.nn.relu(_dense(params, "viewdirs", q))
    rgb = jax.nn.sigmoid(_dense(params, "rgb", hv))
    return rgb, sigma


def arch_shapes(arch=None, x_freqs: int = 10, d_freqs: int = 4) -> Dict[str, Tuple[int, int]]:
    """Layer name -> (d_in, d_out) for an :class:`ArchConfig` family member.

    The canonical default reproduces CANONICAL_SHAPES exactly
    (lego_rust/*/shapes.txt)."""
    from nerf_rs_tpu.config import ArchConfig

    arch = arch or ArchConfig()
    enc_x = 3 + 6 * x_freqs
    enc_d = 3 + 6 * d_freqs
    shapes: Dict[str, Tuple[int, int]] = {}
    d_in = enc_x
    for i in range(arch.depth):
        if i == arch.skip_at + 1:
            d_in += enc_x          # skip concat feeds this layer
        shapes[f"dense{i}"] = (d_in, arch.width)
        d_in = arch.width
    shapes["bottleneck"] = (arch.width, arch.width)
    shapes["viewdirs"] = (arch.width + enc_d, arch.v_width)
    shapes["rgb"] = (arch.v_width, 3)
    shapes["alpha"] = (arch.width, 1)
    return shapes


def init_nerf_params(key: jax.Array, dtype=jnp.float32,
                     arch=None) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Random init for training from scratch (capability the reference
    lacks). Glorot-uniform kernels + zero biases, matching the original TF
    NeRF's tf.keras.layers.Dense defaults. ``arch`` picks the family
    member (default: canonical lego)."""
    shapes = arch_shapes(arch)
    params = {}
    keys = jax.random.split(key, len(shapes))
    for k, (layer, (d_in, d_out)) in zip(keys, shapes.items()):
        limit = np.sqrt(6.0 / (d_in + d_out))
        kernel = jax.random.uniform(k, (d_in, d_out), dtype, minval=-limit, maxval=limit)
        params[layer] = {"kernel": kernel, "bias": jnp.zeros((d_out,), dtype)}
    return params


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
