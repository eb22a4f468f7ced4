"""Fused Pallas kernel: transmittance weights -> interior-weight CDF ->
inverse-CDF importance sampling -> merge + bitonic sort, in ONE launch.

The XLA formulation (ops/volume.compute_weights + ops/sampling.importance_
samples/merge_samples) round-trips ~6 intermediate (rays, samples) arrays
through HBM and issues ~10 separate ops per render chunk (cumprod, cumsum,
one-hot contraction, sort, ...). Here the whole hierarchical-resampling
chain runs on the VPU with rays on sublanes and samples on lanes:

- prefix product/sum as 6-round Hillis-Steele lane scans (pltpu.roll),
- the reference's per-ray linear CDF scan (lib.rs:333-339) as 62 unrolled
  compare-accumulate steps against single-lane broadcasts,
- merge + sort as a full 256-lane bitonic network (36 compare-exchange
  rounds) — +inf padding lanes sort to the tail, so lanes 0:Nc+Nf of the
  output are exactly the sorted merge (lib.rs:416-419).

Numerics match the reference contracts: deltas with far-t last entry
clamped >= 0, alpha = 1-exp(-sigma*delta), T<1e-4 early-out as a mask on
the exclusive product (lib.rs:276-279), interior weights only with +1e-5
floor (lib.rs:299-317), final CDF entry forced to 1.0 (lib.rs:319-328),
in-bin interpolation denominator clamped at 1e-6 (lib.rs:341-347).
Scan orderings differ from XLA's, so agreement with the XLA path is
allclose-level (~1e-6), not bitwise.

Forward-only: the render's fine-sample positions carry stop_gradient in
training anyway (render.py), and the differentiable path keeps the XLA
implementation. Used when RenderConfig.sampling_impl == "pallas".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 256          # fixed lane budget: 64 t | 64 sigma | 128 u
_NC = 64              # coarse samples
_NF = 128             # fine samples
_BIG = np.float32(3.4e38)


def _roll(x, shift):
    """Circular lane roll; pltpu.roll requires non-negative shifts."""
    return pltpu.roll(x, shift % _LANES, axis=1)


def _scan_rounds(op, x, fill, width=_LANES):
    """Inclusive Hillis-Steele prefix scan along lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < width:
        shifted = _roll(x, s)
        x = op(x, jnp.where(lane >= s, shifted, fill))
        s *= 2
    return x


def _bitonic_sort_lanes(x):
    """Ascending bitonic sort of every row's 256 lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 2
    while k <= _LANES:
        j = k // 2
        while j >= 1:
            is_low = (lane & j) == 0
            partner = jnp.where(
                is_low, _roll(x, -j), _roll(x, j)
            )
            ascending = (lane & k) == 0
            keep_min = is_low == ascending
            x = jnp.where(
                keep_min, jnp.minimum(x, partner), jnp.maximum(x, partner)
            )
            j //= 2
        k *= 2
    return x


def _kernel(t_threshold, pdf_eps, cdf_eps,
            packed_ref, far_ref, out_ref):
    f32 = jnp.float32
    x = packed_ref[:]                                 # (R, 256)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    far = far_ref[0, 0]

    t = x                                             # lanes 0:64 valid
    sigma = _roll(x, -_NC)               # sigma[j] at lane j
    u = _roll(x, -_NC * 2)               # u[j] at lane j (0:128)

    # --- transmittance weights (volume.compute_weights semantics) ---
    t_next = _roll(t, -1)
    delta = jnp.where(lane < _NC - 1, t_next - t,
                      jnp.where(lane == _NC - 1, far - t, 0.0))
    delta = jnp.maximum(delta, 0.0)
    alpha = jnp.where(lane < _NC, 1.0 - jnp.exp(-sigma * delta), 0.0)
    one_minus = 1.0 - alpha                           # lanes >= NC: 1.0
    t_incl = _scan_rounds(jnp.multiply, one_minus, 1.0, width=_NC)
    t_excl = jnp.where(lane == 0, 1.0, _roll(t_incl, 1))
    w = t_excl * alpha
    if t_threshold > 0.0:
        w = jnp.where(t_excl >= t_threshold, w, 0.0)

    # --- interior-weight CDF (sampling.importance_samples semantics) ---
    n_bins = _NC - 2                                  # 62
    pdf = jnp.where(lane < n_bins,
                    jnp.maximum(_roll(w, -1), 0.0) + pdf_eps, 0.0)
    csum = _scan_rounds(jnp.add, pdf, 0.0, width=_NC)
    total = csum[:, n_bins - 1:n_bins]                # (R, 1)
    cnorm = csum / total
    cdf = jnp.where(
        lane == 0, 0.0,
        jnp.where(lane < n_bins, _roll(cnorm, 1),
                  jnp.where(lane == n_bins, 1.0, _BIG)),
    )
    bins = jnp.where(lane < _NC - 1, 0.5 * (t + t_next), 0.0)

    # --- inverse-CDF bin lookup: unrolled linear scan (lib.rs:333-339) ---
    zeros = jnp.zeros_like(x)
    acc_lo, acc_hi, acc_bl, acc_bh = zeros, zeros, zeros, zeros
    for j in range(n_bins):
        lo = cdf[:, j:j + 1]
        hi = cdf[:, j + 1:j + 2]
        m = (u >= lo) & (u < hi)
        acc_lo = acc_lo + jnp.where(m, lo, 0.0)
        acc_hi = acc_hi + jnp.where(m, hi, 0.0)
        acc_bl = acc_bl + jnp.where(m, bins[:, j:j + 1], 0.0)
        acc_bh = acc_bh + jnp.where(m, bins[:, j + 1:j + 2], 0.0)

    frac = (u - acc_lo) / jnp.maximum(acc_hi - acc_lo, cdf_eps)
    t_extra = acc_bl + (acc_bh - acc_bl) * frac       # valid on lanes 0:128

    # --- merge + sort: t_c on lanes 0:64, t_extra repositioned to lanes
    # 128:256 (its natural u-lane position rolled right), +inf padding
    # lanes 64:128 sort to the tail of the 256-lane network.
    extra_hi = _roll(t_extra, _NC * 2)   # u-lane j -> lane 128+j
    merged = jnp.where(lane < _NC, t,
                       jnp.where(lane >= _NC * 2, extra_hi, _BIG))
    out_ref[:] = _bitonic_sort_lanes(merged)


@functools.partial(jax.jit, static_argnames=("t_threshold", "pdf_eps", "cdf_eps", "interpret"))
def _resample_call(packed, far, t_threshold, pdf_eps, cdf_eps, interpret):
    n = packed.shape[0]
    tile = min(512, n)
    grid = n // tile
    data_spec = pl.BlockSpec((tile, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, t_threshold, pdf_eps, cdf_eps)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            data_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
        interpret=interpret,
    )(packed, far)


def fused_resample(
    t_c: jnp.ndarray,
    sigma_c: jnp.ndarray,
    u: jnp.ndarray,
    far,
    *,
    t_threshold: float = 1e-4,
    pdf_eps: float = 1e-5,
    cdf_eps: float = 1e-6,
) -> jnp.ndarray:
    """(t_c (N, 64), sigma_c (N, 64), u (N, 128), far) -> merged sorted
    t (N, 192). One fused kernel for the whole coarse->fine resampling
    chain. Forward only (no VJP) — see module docstring."""
    if t_c.shape[-1] != _NC or u.shape[-1] != _NF:
        raise NotImplementedError(
            f"fused_resample is specialized to Nc={_NC}, Nf={_NF}; "
            f"got {t_c.shape[-1]}, {u.shape[-1]} — use sampling_impl='xla'"
        )
    n = t_c.shape[0]
    if n == 0:
        # The pad filler replicates row 0 and the tile math divides by the
        # row count — an empty batch short-circuits (XLA path parity).
        return jnp.zeros((0, _NC + _NF), jnp.float32)
    pad = (-n) % 512
    packed = jnp.concatenate(
        [t_c.astype(jnp.float32), sigma_c.astype(jnp.float32),
         u.astype(jnp.float32)], axis=-1,
    )
    if pad:
        filler = jnp.tile(packed[:1], (pad, 1))
        packed = jnp.concatenate([packed, filler], axis=0)
    interpret = jax.default_backend() != "tpu"
    out = _resample_call(
        packed, jnp.asarray(far, jnp.float32).reshape(1, 1),
        float(t_threshold), float(pdf_eps), float(cdf_eps), interpret,
    )
    return out[:n, : _NC + _NF]
