"""Fused Pallas kernels: transmittance weights -> interior-weight CDF ->
inverse-CDF importance sampling, then merge + bitonic sort (two launches
— a Mosaic v5e compiler crash forbids fusing the sort behind the unrolled
lookup loop, see _kernel_extra).

The XLA formulation (ops/volume.compute_weights + ops/sampling.importance_
samples/merge_samples) round-trips ~6 intermediate (rays, samples) arrays
through HBM and issues ~10 separate ops per render chunk (cumprod, cumsum,
one-hot contraction, sort, ...). Here the whole hierarchical-resampling
chain runs on the VPU with rays on sublanes and samples on lanes:

- prefix product/sum as log2(Nc)-round Hillis-Steele lane scans
  (pltpu.roll),
- the reference's per-ray linear CDF scan (lib.rs:333-339) as Nc-2
  unrolled compare-accumulate steps against single-lane broadcasts,
- merge + sort as a full-width bitonic network — +inf padding lanes sort
  to the tail, so lanes 0:Nc+Nf of the output are exactly the sorted
  merge (lib.rs:416-419).

Generic over the sample counts: any power-of-two (Nc, Nf) whose packed
row width 2*Nc+Nf is a multiple of 128 lanes — (64, 128) the reference
native preset and (32, 64) its reduced wasm preset (src/lib.rs:603-612)
both qualify.

Numerics match the reference contracts: deltas with far-t last entry
clamped >= 0, alpha = 1-exp(-sigma*delta), T<1e-4 early-out as a mask on
the exclusive product (lib.rs:276-279), interior weights only with +1e-5
floor (lib.rs:299-317), final CDF entry forced to 1.0 (lib.rs:319-328),
in-bin interpolation denominator clamped at 1e-6 (lib.rs:341-347).
Scan orderings differ from XLA's, so agreement with the XLA path is
allclose-level (~1e-6), not bitwise.

Forward-only: the kernel has no VJP. render.py stops gradients on its
inputs and re-attaches d/dt_c with a straight-through scatter so the
differentiable semantics match the XLA path. Used when
RenderConfig.sampling_impl == "pallas".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(3.4e38)


def supported(nc: int, nf: int) -> bool:
    """The kernel handles power-of-two sample counts whose packed row
    (t | sigma | u -> 2*nc+nf lanes) is lane-aligned AND a power of two —
    the bitonic network's merge stages (lane & k masks, k doubling to the
    full width) are only a sorting network at power-of-two widths; e.g.
    (64, 256) packs to 384 lanes, which is 128-aligned but would leave the
    final merge stage missing and pltpu.roll wrapping mod 384 -> silently
    unsorted output."""
    pow2 = lambda v: v > 0 and (v & (v - 1)) == 0  # noqa: E731
    lanes = 2 * nc + nf
    return (pow2(nc) and pow2(nf) and nc >= 8
            and lanes % 128 == 0 and pow2(lanes))


def _roll(x, shift, lanes):
    """Circular lane roll; pltpu.roll requires non-negative shifts."""
    return pltpu.roll(x, shift % lanes, axis=1)


def _scan_rounds(op, x, fill, width, lanes):
    """Inclusive Hillis-Steele prefix scan along lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < width:
        shifted = _roll(x, s, lanes)
        x = op(x, jnp.where(lane >= s, shifted, fill))
        s *= 2
    return x


def _bitonic_sort_lanes(x, lanes):
    """Ascending bitonic sort of every row's lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 2
    while k <= lanes:
        j = k // 2
        while j >= 1:
            is_low = (lane & j) == 0
            partner = jnp.where(
                is_low, _roll(x, -j, lanes), _roll(x, j, lanes)
            )
            ascending = (lane & k) == 0
            # NOT xor, not i1 == i1: Mosaic (v5e) rejects vector bool
            # equality ("Target does not support this comparison").
            keep_min = jnp.logical_not(jnp.logical_xor(is_low, ascending))
            x = jnp.where(
                keep_min, jnp.minimum(x, partner), jnp.maximum(x, partner)
            )
            j //= 2
        k *= 2
    return x


def _kernel_extra(nc, nf, t_threshold, pdf_eps, cdf_eps, per_ray,
                  packed_ref, far_ref, out_ref):
    """First launch: weights -> CDF -> inverse-CDF lookup. Writes t_extra
    (valid on lanes 0:nf). The merge + sort live in a SECOND launch
    (_kernel_merge): Mosaic's v5e compiler CRASHES (remote-compile HTTP
    500, compile-helper subprocess exit 1 — bisected 2026-08-19,
    _repro_resample.py) on any program that keeps the packed input alive
    across the nc-2-step unrolled lookup loop and then SELECTS between it
    and the loop's result; each half compiles and runs fine on its own.
    The split costs one extra (R, lanes) HBM round-trip — micro-seconds
    per chunk next to the MLP."""
    lanes = 2 * nc + nf
    x = packed_ref[:]                                 # (R, lanes)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if per_ray:
        # Per-ray far (the AABB-clamped modes cap each ray's integration
        # range individually): a lane-replicated (R, 128) VMEM block,
        # loaded whole and value-sliced to (R, 1) — the lane broadcast
        # pattern csum/total already uses. A (tile, 1) block spec crashes
        # the Mosaic remote compile too, so the input is padded to the
        # 128-lane minimum.
        far = far_ref[:][:, :1]                       # (R, 1)
    else:
        far = far_ref[0, 0]                           # SMEM scalar

    t = x                                             # lanes 0:nc valid
    sigma = _roll(x, -nc, lanes)         # sigma[j] at lane j
    u = _roll(x, -nc * 2, lanes)         # u[j] at lane j (0:nf)

    # --- transmittance weights (volume.compute_weights semantics) ---
    t_next = _roll(t, -1, lanes)
    delta = jnp.where(lane < nc - 1, t_next - t,
                      jnp.where(lane == nc - 1, far - t, 0.0))
    delta = jnp.maximum(delta, 0.0)
    alpha = jnp.where(lane < nc, 1.0 - jnp.exp(-sigma * delta), 0.0)
    one_minus = 1.0 - alpha                           # lanes >= nc: 1.0
    t_incl = _scan_rounds(jnp.multiply, one_minus, 1.0, nc, lanes)
    t_excl = jnp.where(lane == 0, 1.0, _roll(t_incl, 1, lanes))
    w = t_excl * alpha
    if t_threshold > 0.0:
        w = jnp.where(t_excl >= t_threshold, w, 0.0)

    # --- interior-weight CDF (sampling.importance_samples semantics) ---
    n_bins = nc - 2
    pdf = jnp.where(lane < n_bins,
                    jnp.maximum(_roll(w, -1, lanes), 0.0) + pdf_eps, 0.0)
    csum = _scan_rounds(jnp.add, pdf, 0.0, nc, lanes)
    total = csum[:, n_bins - 1:n_bins]                # (R, 1)
    cnorm = csum / total
    cdf = jnp.where(
        lane == 0, 0.0,
        jnp.where(lane < n_bins, _roll(cnorm, 1, lanes),
                  jnp.where(lane == n_bins, 1.0, _BIG)),
    )
    bins = jnp.where(lane < nc - 1, 0.5 * (t + t_next), 0.0)

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
    out_ref[:] = acc_bl + (acc_bh - acc_bl) * frac    # valid on lanes 0:nf


def _kernel_merge(nc, nf, packed_ref, extra_ref, out_ref):
    """Second launch: merge + bitonic sort. t_c on lanes 0:nc, t_extra
    repositioned to lanes 2*nc:2*nc+nf (its natural u-lane position
    rolled right), +inf padding lanes nc:2*nc sort to the tail of the
    full-width network. Split from _kernel_extra — see its docstring."""
    lanes = 2 * nc + nf
    x = packed_ref[:]
    t_extra = extra_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    extra_hi = _roll(t_extra, nc * 2, lanes)  # u-lane j -> lane 2*nc+j
    merged = jnp.where(lane < nc, x,
                       jnp.where(lane >= nc * 2, extra_hi, _BIG))
    out_ref[:] = _bitonic_sort_lanes(merged, lanes)


@functools.partial(jax.jit, static_argnames=("nc", "nf", "t_threshold",
                                             "pdf_eps", "cdf_eps", "per_ray",
                                             "interpret"))
def _resample_call(packed, far, nc, nf, t_threshold, pdf_eps, cdf_eps,
                   per_ray, interpret):
    lanes = 2 * nc + nf
    n = packed.shape[0]
    tile = min(512, n)
    grid = n // tile
    data_spec = pl.BlockSpec((tile, lanes), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    far_spec = (pl.BlockSpec((tile, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) if per_ray else
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM))
    t_extra = pl.pallas_call(
        functools.partial(_kernel_extra, nc, nf, t_threshold, pdf_eps,
                          cdf_eps, per_ray),
        grid=(grid,),
        in_specs=[data_spec, far_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.float32),
        interpret=interpret,
    )(packed, far)
    return pl.pallas_call(
        functools.partial(_kernel_merge, nc, nf),
        grid=(grid,),
        in_specs=[data_spec, data_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.float32),
        interpret=interpret,
    )(packed, t_extra)


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
    """(t_c (N, Nc), sigma_c (N, Nc), u (N, Nf), far) -> merged sorted
    t (N, Nc+Nf). One fused kernel for the whole coarse->fine resampling
    chain. ``far`` is a scalar or per-ray (N,)/(N, 1) — the AABB-clamped
    accel modes cap each ray's integration range individually. Forward
    only (no VJP) — see module docstring."""
    nc, nf = int(t_c.shape[-1]), int(u.shape[-1])
    if not supported(nc, nf):
        raise NotImplementedError(
            f"fused_resample needs power-of-two sample counts with "
            f"(2*Nc+Nf) % 128 == 0; got ({nc}, {nf}) — use "
            "sampling_impl='xla'"
        )
    n = t_c.shape[0]
    if n == 0:
        # The pad filler replicates row 0 and the tile math divides by the
        # row count — an empty batch short-circuits (XLA path parity).
        return jnp.zeros((0, nc + nf), jnp.float32)
    pad = (-n) % 512
    packed = jnp.concatenate(
        [t_c.astype(jnp.float32), sigma_c.astype(jnp.float32),
         u.astype(jnp.float32)], axis=-1,
    )
    # A 0-d far is the SMEM-scalar fast path (the proven layout); per-ray
    # far rides a lane-replicated (n, 128) VMEM block — see _kernel.
    per_ray = jnp.ndim(far) > 0 and np.prod(np.shape(far)) > 1
    if per_ray:
        far_in = jnp.broadcast_to(
            jnp.asarray(far, jnp.float32).reshape(-1, 1), (n, 128))
    else:
        far_in = jnp.asarray(far, jnp.float32).reshape(1, 1)
    if pad:
        filler = jnp.tile(packed[:1], (pad, 1))
        packed = jnp.concatenate([packed, filler], axis=0)
        if per_ray:
            far_in = jnp.concatenate(
                [far_in, jnp.tile(far_in[:1], (pad, 1))], axis=0)
    interpret = jax.default_backend() != "tpu"
    out = _resample_call(
        packed, far_in, nc, nf,
        float(t_threshold), float(pdf_eps), float(cdf_eps), bool(per_ray),
        interpret,
    )
    return out[:n, : nc + nf]
