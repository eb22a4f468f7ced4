"""Fused Pallas TPU kernel: positional encode + the full NeRF MLP.

Replaces the reference's per-layer GEMM chain (Layer::forward_matrix,
/root/reference/src/network.rs:62-170, 13 matmuls per batch with every
activation round-tripping through memory) with ONE kernel per batch tile:
activations never leave VMEM and weights are DMA'd to VMEM exactly once
per launch.

Design notes (v2 — TPU-first, measured on v5e):

* Transposed (feature-major) layout: activations are (features, batch)
  with the batch on the 128-wide lane axis — matching the reference's own
  (features x batch) convention (network.rs:197) but chosen here because
  it makes every matmul a clean (out, in) x (in, T) MXU pass with NO
  padded K lanes beyond 64/32 rounding, and shrinks the kernel's
  input/output DMA to an (8, T) stripe: rows 0-2 points, 3-5 dirs in;
  rows 0-2 rgb, row 3 sigma out (16x less IO than a 128-lane row layout).

* Weights ride in ONE packed blob that the kernel copies HBM -> VMEM
  scratch at grid step 0 and reuses for every later step. This both
  bounds weight traffic at one copy per launch and sidesteps a measured
  pathology where operands *computed inside* the enclosing jit (e.g.
  params cast to bf16 by a training step) made per-step pipelined operand
  fetches ~3x slower than jit-argument operands.

* Encoding-as-matmul: one (128, 8) f32 projection G with G[c, axis] =
  2^band builds the sin/cos arguments for BOTH the L=10 point encoding
  (rows 0:63) and the L=4 dir encoding (rows 64:91) in a single K=8 MXU
  pass; identity/sin/cos lanes are selected with constant row masks. The
  row order matches the reference scheme (identity, then sin-triple/
  cos-triple per doubling band, no pi — network.rs:263-330).

* Concat-free skip connections: the 319-wide skip (network.rs:210-211)
  and 283-wide bottleneck||viewdir concat (network.rs:219-220) each
  become TWO matmuls on the split transposed weight summed in VMEM —
  numerically identical, no relayout, no MXU-hostile odd widths.

* In bfloat16 mode, cos(x) is computed as sin(x + pi/2) so the encoding
  costs ONE transcendental pass; float32 (oracle-parity) mode keeps the
  exact cos.

* A sigma-only kernel variant serves the coarse pass: the reference
  discards coarse colors (lib.rs:404), so bottleneck/viewdirs/rgb
  (~17% of the FLOPs) are skipped entirely.

Numerics: float32 mode uses precision=HIGHEST matmuls and is validated
allclose (<=1e-5-ish) against the pure-JAX oracle (models/mlp.py);
bfloat16 mode casts matmul inputs with f32 accumulation for speed.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_H = 256          # hidden width
_VH = 128         # viewdirs hidden width
_XF, _DF = 10, 4  # encoding bands (points, dirs)
_XE = 3 + 6 * _XF             # 63
_DE = 3 + 6 * _DF             # 27
_DOFF = 64                    # dir-encoding row offset in the enc buffer

# --- weight blob layout: transposed (out, in) weights stacked on the
# sublane axis, 256 lanes wide. Offsets are multiples of 16 so bf16
# sublane slicing stays tile-aligned.
_SLOTS = {
    # K is always 128 or 256: lane slices at non-128 boundaries force Mosaic
    # relayout copies (a K=64 dense0 measured SLOWER than a K=256 layer).
    # Sub-width inputs are zero-padded in the weight columns instead, so
    # e.g. dense0 consumes the full 128-row encode buffer (dir rows and
    # padding rows hit zero columns).
    "w0t": (0, _H),        # dense0^T  (256, 128)  cols 63:128 zero
    "w1t": (256, _H),
    "w2t": (512, _H),
    "w3t": (768, _H),
    "w4t": (1024, _H),
    "w5at": (1280, _H),    # dense5^T skip rows (256, 128), cols 63:128 zero
    "w5bt": (1536, _H),    # dense5^T rows for h4, K=256
    "w6t": (1792, _H),
    "w7t": (2048, _H),
    "wbt": (2304, _H),     # bottleneck^T
    "wvat": (2560, _VH),   # viewdirs^T rows for bottleneck, K=256
    "wvbt": (2688, _VH),   # viewdirs^T dir rows at cols 64:91 of (128, 128)
    "wst": (2816, 16),     # sigma head: alpha^T at row 3 (lands at out row 3)
    "wrt": (2832, 16),     # rgb head: rgb^T at rows 0:3, K lanes 0:128
}
_BLOB_ROWS = 2848

# --- aux blob (always f32): encode projection + bias table.
_AUX_G_ROWS = LANES                       # rows 0:128, lanes 0:8 = G
_AUX_B_OFF = LANES                        # rows 128:384, lanes 0:12 = biases
_AUX_ROWS = LANES + _H                    # 384
# bias columns (by layer index used in the kernel)
_BIAS_COLS = 12  # dense0..7 -> 0..7, bottleneck -> 8, viewdirs -> 9,
#                  sigma head -> 10 (at row 3), rgb head -> 11 (rows 0:3)


def _encode_projection() -> np.ndarray:
    """(128, 8) G with (G @ x)[c, :] = freq_c * coord_{axis_c}.

    Input rows 0-2 carry the point xyz, rows 3-5 the dir xyz. Output rows
    0:63 are the point-encoding lanes (identity, then per band k the
    sin-args then cos-args, frequency 2^k with NO pi factor —
    network.rs:274-287); rows 64:91 the dir-encoding lanes likewise
    (network.rs:294-330).
    """
    g = np.zeros((LANES, 8), np.float32)
    for axis in range(3):
        g[axis, axis] = 1.0                       # point identity
        g[_DOFF + axis, 3 + axis] = 1.0           # dir identity
    for k in range(_XF):
        for o in range(6):
            g[3 + 6 * k + o, o % 3] = float(2.0 ** k)
    for k in range(_DF):
        for o in range(6):
            g[_DOFF + 3 + 6 * k + o, 3 + (o % 3)] = float(2.0 ** k)
    return g


def _row_selectors(shape):
    """Boolean (row-wise) selectors over the encoding buffer: identity rows
    and sin rows (everything else is a cos row). Rows 63 and 91:128 are
    padding — their values are arbitrary, zeroed later by padded weight
    columns."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    ident = (r < 3) | ((r >= _DOFF) & (r < _DOFF + 3))
    d = jnp.where(r < _DOFF, r - 3, r - (_DOFF + 3))
    is_sin = (d % 6) < 3
    return ident, is_sin


def pack_params(params, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack the param pytree into (blob (2848, 256) dtype, aux (384, 256) f32).

    The blob holds every weight transposed to (out, in); aux holds the
    encode projection and the bias table (column j = layer j's bias).
    """
    # Built with pure pad/transpose/concat — dynamic_update_slice / scatter
    # formulations measured ~70 ms on v5e for this same packing (tiny strided
    # scatters serialize); this version is sub-ms.
    from nerf_rs_tpu.io.weights import CANONICAL_SHAPES

    for layer, shape in CANONICAL_SHAPES.items():
        got = tuple(params[layer]["kernel"].shape) if layer in params else None
        if got != shape:
            raise ValueError(
                f"fused kernel is specialized to the canonical lego arch; "
                f"{layer}.kernel is {got}, expected {shape} — run non-"
                f"canonical ArchConfig members with impl='xla'")
    cdt = jnp.dtype(dtype)
    k = lambda name: jnp.asarray(params[name]["kernel"], jnp.float32)
    b = lambda name: jnp.asarray(params[name]["bias"], jnp.float32)

    d5 = k("dense5")   # (63+256, 256), encoded-input rows FIRST (lib.rs:133-152)
    vw = k("viewdirs")  # (256+27, 128), bottleneck rows FIRST

    def slot(name, w_t):
        off, rows = _SLOTS[name]
        return jnp.pad(w_t, ((0, rows - w_t.shape[0]), (0, 256 - w_t.shape[1])))

    pieces = [
        slot("w0t", k("dense0").T),
        *[slot(f"w{i}t", k(f"dense{i}").T) for i in range(1, 5)],
        slot("w5at", d5[:_XE].T),
        slot("w5bt", d5[_XE:].T),
        slot("w6t", k("dense6").T),
        slot("w7t", k("dense7").T),
        slot("wbt", k("bottleneck").T),
        slot("wvat", vw[:_H].T),
        # dir-encoding rows land at input columns _DOFF:_DOFF+27 so the
        # matmul consumes the full 128-row encode buffer (K=128 aligned)
        slot("wvbt", jnp.pad(vw[_H:].T, ((0, 0), (_DOFF, 0)))),
        # heads: alpha lands at out row 3, rgb at out rows 0:2
        slot("wst", jnp.pad(k("alpha").T, ((3, 0), (0, 0)))),
        slot("wrt", k("rgb").T),
    ]
    blob = jnp.concatenate(pieces, axis=0).astype(cdt)
    assert blob.shape == (_BLOB_ROWS, 256), blob.shape

    def bias_col(v, top=0):
        return jnp.pad(v, (top, _H - top - v.shape[0]))

    bias_tab = jnp.stack(
        [bias_col(b(f"dense{i}")) for i in range(8)]
        + [bias_col(b("bottleneck")), bias_col(b("viewdirs")),
           bias_col(b("alpha"), top=3), bias_col(b("rgb"))],
        axis=1,
    )  # (256, 12)
    aux = jnp.concatenate(
        [
            jnp.pad(jnp.asarray(_encode_projection()), ((0, 0), (0, 256 - 8))),
            jnp.pad(bias_tab, ((0, 0), (0, 256 - _BIAS_COLS))),
        ],
        axis=0,
    )
    assert aux.shape == (_AUX_ROWS, 256), aux.shape
    return blob, aux


def _kernel_body(cdt, sigma_only, fast_cos, interleave,
                 x_ref, blob_ref, aux_ref, out_ref, ws, wa, sems):
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp_w = pltpu.make_async_copy(blob_ref, ws, sems.at[0])
        cp_a = pltpu.make_async_copy(aux_ref, wa, sems.at[1])
        cp_w.start()
        cp_a.start()
        cp_w.wait()
        cp_a.wait()

    if interleave:
        # Two independent half-tile chains: gives Mosaic's scheduler
        # MXU-independent VPU work (encode/epilogues of one half can
        # overlap matmuls of the other).
        t = x_ref.shape[1] // 2
        out_ref[:, 0:t] = _mlp_chain(cdt, sigma_only, fast_cos,
                                     x_ref[:, 0:t], ws, wa)
        out_ref[:, t:2 * t] = _mlp_chain(cdt, sigma_only, fast_cos,
                                         x_ref[:, t:2 * t], ws, wa)
    else:
        out_ref[:] = _mlp_chain(cdt, sigma_only, fast_cos, x_ref[:], ws, wa)


def _mlp_chain(cdt, sigma_only, fast_cos, x, ws, wa):
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    prec = hi if cdt == f32 else None
    g = wa[0:LANES, 0:8]                             # (128, 8) f32
    raw = jnp.dot(g, x, preferred_element_type=f32, precision=hi)  # (128, T)

    ident, is_sin = _row_selectors(raw.shape)
    if fast_cos:
        # cos(x) = sin(x + pi/2): one transcendental pass. Arg error from
        # the f32 phase add is ~1e-4 at |x|<=2048 — far below bf16 noise.
        tr = jnp.sin(raw + jnp.where(is_sin, 0.0, np.float32(np.pi / 2)))
        enc = jnp.where(ident, raw, tr).astype(cdt)
    else:
        tr = jnp.where(is_sin, jnp.sin(raw), jnp.cos(raw))
        enc = jnp.where(ident, raw, tr).astype(cdt)

    def lay(name, h, klanes, bias_col, relu=True):
        off, rows = _SLOTS[name]
        acc = jnp.dot(ws[off:off + rows, 0:klanes], h,
                      preferred_element_type=f32, precision=prec)
        acc = acc + wa[_AUX_B_OFF:_AUX_B_OFF + rows, bias_col:bias_col + 1]
        return jnp.maximum(acc, 0.0) if relu else acc

    def lay2(na, ha, ka, nb, hb, kb, bias_col, relu=True):
        offa, rows = _SLOTS[na]
        offb, _ = _SLOTS[nb]
        acc = jnp.dot(ws[offa:offa + rows, 0:ka], ha,
                      preferred_element_type=f32, precision=prec)
        acc = acc + jnp.dot(ws[offb:offb + rows, 0:kb], hb,
                            preferred_element_type=f32, precision=prec)
        acc = acc + wa[_AUX_B_OFF:_AUX_B_OFF + rows, bias_col:bias_col + 1]
        return jnp.maximum(acc, 0.0) if relu else acc

    h = lay("w0t", enc, 128, 0).astype(cdt)
    for i in range(1, 5):
        h = lay(f"w{i}t", h, 256, i).astype(cdt)
    h = lay2("w5at", enc, 128, "w5bt", h, 256, 5).astype(cdt)   # skip concat
    h = lay("w6t", h, 256, 6).astype(cdt)
    h8 = lay("w7t", h, 256, 7).astype(cdt)

    sig8 = lay("wst", h8, 256, 10)[0:8]             # (8, T), row 3 = sigma
    row = jax.lax.broadcasted_iota(jnp.int32, sig8.shape, 0)

    if sigma_only:
        return jnp.where(row == 3, sig8, 0.0)

    bneck = lay("wbt", h8, 256, 8, relu=False).astype(cdt)
    hv = lay2("wvat", bneck, 256, "wvbt", enc, 128, 9).astype(cdt)
    rgb8 = jax.nn.sigmoid(lay("wrt", hv, 128, 11, relu=False)[0:8])  # rows 0:2
    return jnp.where(row == 3, sig8, jnp.where(row < 3, rgb8, 0.0))


def _kernel_bwd(cdt, fast_cos,
                x_ref, g_ref, blob_ref, aux_ref,
                dx_ref, dblob_ref, daux_ref, ws, wa, sems):
    """Fused backward: recompute the forward per tile (activations never
    touch HBM), backprop through every layer, and accumulate weight/bias
    grads into the constant-index output refs — Mosaic keeps those VMEM-
    resident across the sequential grid and flushes once at the end."""
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    prec = hi if cdt == f32 else None

    @pl.when(pl.program_id(0) == 0)
    def _():
        cp_w = pltpu.make_async_copy(blob_ref, ws, sems.at[0])
        cp_a = pltpu.make_async_copy(aux_ref, wa, sems.at[1])
        cp_w.start()
        cp_a.start()
        cp_w.wait()
        cp_a.wait()
        dblob_ref[:] = jnp.zeros_like(dblob_ref)
        daux_ref[:] = jnp.zeros_like(daux_ref)

    # --- forward recompute (matches _kernel_body exactly) ---
    x = x_ref[:]
    gproj = wa[0:LANES, 0:8]
    raw = jnp.dot(gproj, x, preferred_element_type=f32, precision=hi)
    ident, is_sin = _row_selectors(raw.shape)
    if fast_cos:
        phase = jnp.where(is_sin, 0.0, np.float32(np.pi / 2))
        tr = jnp.sin(raw + phase)
        dtr = jnp.cos(raw + phase)
    else:
        tr = jnp.where(is_sin, jnp.sin(raw), jnp.cos(raw))
        dtr = jnp.where(is_sin, jnp.cos(raw), -jnp.sin(raw))
    enc = jnp.where(ident, raw, tr).astype(cdt)
    denc_draw = jnp.where(ident, 1.0, dtr)          # d(enc)/d(raw), f32

    def w(name):
        off, rows = _SLOTS[name]
        return ws[off:off + rows]

    def bias(col, rows):
        return wa[_AUX_B_OFF:_AUX_B_OFF + rows, col:col + 1]

    def fl(name, h, bias_col, relu=True, add=None):
        rows = _SLOTS[name][1]
        acc = jnp.dot(w(name)[:, : h.shape[0]], h,
                      preferred_element_type=f32, precision=prec)
        if add is not None:
            acc = acc + add
        acc = acc + bias(bias_col, rows)
        return jnp.maximum(acc, 0.0) if relu else acc

    def mm(name, h):
        return jnp.dot(w(name)[:, : h.shape[0]], h,
                       preferred_element_type=f32, precision=prec)

    h0 = fl("w0t", enc, 0).astype(cdt)
    h1 = fl("w1t", h0, 1).astype(cdt)
    h2 = fl("w2t", h1, 2).astype(cdt)
    h3 = fl("w3t", h2, 3).astype(cdt)
    h4 = fl("w4t", h3, 4).astype(cdt)
    h5 = fl("w5bt", h4, 5, add=mm("w5at", enc)).astype(cdt)
    h6 = fl("w6t", h5, 6).astype(cdt)
    h7 = fl("w7t", h6, 7).astype(cdt)
    s8 = fl("wst", h7, 10, relu=False)               # (16, T) f32
    bn = fl("wbt", h7, 8, relu=False).astype(cdt)
    hv = fl("wvat", bn, 9, add=mm("wvbt", enc)).astype(cdt)
    r8 = fl("wrt", hv, 11, relu=False)               # (16, T) f32

    # --- backward ---
    gg = g_ref[:]                                    # (8, T) f32
    row8 = jax.lax.broadcasted_iota(jnp.int32, gg.shape, 0)
    z8 = jnp.zeros_like(gg)
    rgb16 = jnp.concatenate([jnp.where(row8 < 3, gg, 0.0), z8], axis=0)
    sig16 = jnp.concatenate([jnp.where(row8 == 3, gg, 0.0), z8], axis=0)
    sgm = jax.nn.sigmoid(r8)
    dr8 = (rgb16 * sgm * (1.0 - sgm)).astype(cdt)    # d(pre-sigmoid), rows 0:2
    ds8 = (sig16 * (s8 > 0)).astype(cdt)             # d(pre-relu sigma), row 3

    def acc_w(name, dh, hin):
        off, rows = _SLOTS[name]
        kl = hin.shape[0]
        dw = jax.lax.dot_general(dh, hin, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32, precision=prec)
        dblob_ref[off:off + rows, 0:kl] = dblob_ref[off:off + rows, 0:kl] + dw

    def acc_b(col, dh):
        rows = dh.shape[0]
        sl = daux_ref[_AUX_B_OFF:_AUX_B_OFF + rows, col:col + 1]
        daux_ref[_AUX_B_OFF:_AUX_B_OFF + rows, col:col + 1] = (
            sl + jnp.sum(dh.astype(f32), axis=1, keepdims=True)
        )

    def bwd_in(name, dh):
        # (rows, 256-lane weight)^T @ dh -> gradient w.r.t. the layer input
        return jax.lax.dot_general(w(name), dh, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32, precision=prec)

    acc_w("wrt", dr8, hv)
    acc_b(11, dr8)
    dhv = (bwd_in("wrt", dr8)[:_VH] * (hv > 0)).astype(cdt)
    acc_w("wvat", dhv, bn)
    acc_w("wvbt", dhv, enc)
    acc_b(9, dhv)
    dbn = bwd_in("wvat", dhv).astype(cdt)            # bottleneck: no relu
    de = bwd_in("wvbt", dhv)[:LANES]                 # f32 (128, T)
    acc_w("wbt", dbn, h7)
    acc_b(8, dbn)
    acc_w("wst", ds8, h7)
    acc_b(10, ds8)
    dh7 = ((bwd_in("wbt", dbn) + bwd_in("wst", ds8)) * (h7 > 0)).astype(cdt)
    acc_w("w7t", dh7, h6)
    acc_b(7, dh7)
    dh6 = (bwd_in("w7t", dh7) * (h6 > 0)).astype(cdt)
    acc_w("w6t", dh6, h5)
    acc_b(6, dh6)
    dh5 = (bwd_in("w6t", dh6) * (h5 > 0)).astype(cdt)
    acc_w("w5bt", dh5, h4)
    acc_w("w5at", dh5, enc)
    acc_b(5, dh5)
    de = de + bwd_in("w5at", dh5)[:LANES]
    dh = (bwd_in("w5bt", dh5) * (h4 > 0)).astype(cdt)
    for i, hin in ((4, h3), (3, h2), (2, h1)):
        acc_w(f"w{i}t", dh, hin)
        acc_b(i, dh)
        dh = (bwd_in(f"w{i}t", dh) * (hin > 0)).astype(cdt)
    acc_w("w1t", dh, h0)
    acc_b(1, dh)
    dh0 = (bwd_in("w1t", dh) * (h0 > 0)).astype(cdt)
    acc_w("w0t", dh0, enc)
    acc_b(0, dh0)
    de = de + bwd_in("w0t", dh0)[:LANES]

    draw = de * denc_draw
    dx_ref[:] = jax.lax.dot_general(gproj, draw, (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32, precision=hi)


def _backward_t(blob, aux, x, g, dtype, tile, fast_cos, interpret):
    """x, g: (8, N) f32 -> (dx (8, N) f32, dblob, daux f32 grads)."""
    cdt = jnp.dtype(dtype)
    n = x.shape[1]
    grid = n // tile
    data_spec = pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    full_out = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_bwd, cdt, fast_cos and cdt != jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            data_spec, data_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            data_spec,
            full_out((_BLOB_ROWS, 256)),
            full_out((_AUX_ROWS, 256)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((_BLOB_ROWS, 256), jnp.float32),
            jax.ShapeDtypeStruct((_AUX_ROWS, 256), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_BLOB_ROWS, 256), cdt),
            pltpu.VMEM((_AUX_ROWS, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * _FLOPS_FULL * n,
            bytes_accessed=n * 8 * 16 + 2 * _BLOB_ROWS * 256 * 4,
            transcendentals=n * LANES,
        ),
        interpret=interpret,
    )(x, g, blob, aux)


def unpack_grads(dblob: jnp.ndarray, daux: jnp.ndarray):
    """Map packed blob/aux gradients back to the param-pytree layout."""
    def g(name):
        off, rows = _SLOTS[name]
        return dblob[off:off + rows]

    bt = daux[_AUX_B_OFF:]

    def gb(col, n, top=0):
        return bt[top:top + n, col]

    out = {f"dense{i}": {"kernel": g(f"w{i}t")[:, :_H].T, "bias": gb(i, _H)}
           for i in range(1, 5)}
    out["dense0"] = {"kernel": g("w0t")[:, :_XE].T, "bias": gb(0, _H)}
    out["dense5"] = {
        "kernel": jnp.concatenate([g("w5at")[:, :_XE].T, g("w5bt")[:, :_H].T], axis=0),
        "bias": gb(5, _H),
    }
    out["dense6"] = {"kernel": g("w6t")[:, :_H].T, "bias": gb(6, _H)}
    out["dense7"] = {"kernel": g("w7t")[:, :_H].T, "bias": gb(7, _H)}
    out["bottleneck"] = {"kernel": g("wbt")[:, :_H].T, "bias": gb(8, _H)}
    out["viewdirs"] = {
        "kernel": jnp.concatenate(
            [g("wvat")[:, :_H].T, g("wvbt")[:, _DOFF:_DOFF + _DE].T], axis=0
        ),
        "bias": gb(9, _VH),
    }
    out["alpha"] = {"kernel": g("wst")[3, :_H][:, None], "bias": gb(10, 1, top=3)}
    out["rgb"] = {"kernel": g("wrt")[0:3, :_VH].T, "bias": gb(11, 3)}
    return out


def _reduce_to_shape(x: jnp.ndarray, shape) -> jnp.ndarray:
    """Sum ``x`` down to broadcast-source ``shape`` (numpy rules)."""
    extra = x.ndim - len(shape)
    if extra:
        x = jnp.sum(x, axis=tuple(range(extra)))
    axes = tuple(i for i, (a, b) in enumerate(zip(x.shape, shape)) if b == 1 and a != 1)
    if axes:
        x = jnp.sum(x, axis=axes, keepdims=True)
    return x


# FLOPs per sample (batch column) for the cost model, full network.
_FLOPS_FULL = 2 * (
    LANES * 8                 # encode projection
    + 2 * _H * 64             # w0t, w5at
    + 8 * _H * _H             # w1-4, w5b, w6, w7, wb
    + 16 * _H                 # sigma head
    + _VH * _H + _VH * 32     # wvat, wvbt
    + 16 * _VH                # rgb head
)
_FLOPS_SIGMA = 2 * (LANES * 8 + 2 * _H * 64 + 7 * _H * _H + 16 * _H)


def _forward_t(blob, aux, x, dtype, tile, sigma_only, fast_cos, interpret,
               interleave=False):
    """x: (8, N) f32, N a multiple of ``tile`` -> (8, N) f32 out
    [rows 0-2 rgb, row 3 sigma]."""
    cdt = jnp.dtype(dtype)
    n = x.shape[1]
    grid = n // tile
    interleave = interleave and tile % 256 == 0
    data_spec = pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_body, cdt, sigma_only,
                               fast_cos and cdt != jnp.float32, interleave)
    flops = (_FLOPS_SIGMA if sigma_only else _FLOPS_FULL) * n
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            data_spec,
            pl.BlockSpec(memory_space=pl.ANY),      # weight blob (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),      # aux blob (manual DMA)
        ],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_BLOB_ROWS, 256), cdt),
            pltpu.VMEM((_AUX_ROWS, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),     # sequential: step-0 DMA
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * 8 * 8 + _BLOB_ROWS * 256 * cdt.itemsize,
            transcendentals=n * LANES,
        ),
        interpret=interpret,
    )(x, blob, aux)


from nerf_rs_tpu.utils import round_up as _round_up


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _make_op(x_freqs: int, d_freqs: int, dtype: str, tile: int, sigma_only: bool,
             interleave: bool):
    if (x_freqs, d_freqs) != (_XF, _DF):
        raise NotImplementedError(
            f"fused kernel is specialized to L=({_XF},{_DF}) encodings, "
            f"got ({x_freqs},{d_freqs}) — use impl='xla'"
        )
    if tile % LANES or tile <= 0:
        # n_pad inherits tile's alignment; the backward tile search assumes
        # a 128-multiple and would otherwise fail mid-trace.
        raise ValueError(f"tile must be a positive multiple of {LANES}, "
                         f"got {tile}")
    interpret = not _is_tpu()

    def pack_x(points, viewdirs):
        batch_shape = points.shape[:-1]
        vd = jnp.broadcast_to(viewdirs, points.shape)
        n = int(np.prod(batch_shape)) if batch_shape else 1
        x6 = jnp.concatenate(
            [points.reshape(n, 3), vd.reshape(n, 3)], axis=-1
        ).astype(jnp.float32)
        t = min(tile, _round_up(max(n, 1), LANES))
        n_pad = _round_up(max(n, 1), t)
        x = jnp.pad(x6, ((0, n_pad - n), (0, 2))).T      # (8, n_pad)
        return x, n, t, batch_shape

    def forward(params, points, viewdirs):
        x, n, t, batch_shape = pack_x(points, viewdirs)
        blob, aux = pack_params(params, dtype)
        out = _forward_t(blob, aux, x, dtype, t, sigma_only, True, interpret,
                         interleave=interleave)
        sigma = out[3, :n].reshape(batch_shape)
        rgb = out[0:3, :n].T.reshape(*batch_shape, 3)
        return rgb, sigma

    @jax.custom_vjp
    def op(params, points, viewdirs):
        return forward(params, points, viewdirs)

    def op_fwd(params, points, viewdirs):
        return forward(params, points, viewdirs), (params, points, viewdirs)

    def op_bwd(res, g):
        # Fused Pallas backward: recompute-forward + backprop in one kernel,
        # weight grads accumulated in VMEM across the grid (no per-layer
        # activation round-trips, unlike autodiff of the XLA oracle).
        params, points, viewdirs = res
        g_rgb, g_sigma = g
        if sigma_only:
            # The primal's rgb output is identically zero (color branch
            # skipped), so an rgb cotangent must not inject phantom
            # gradients through the color-branch weights.
            g_rgb = jnp.zeros_like(g_rgb)
        x, n, t, batch_shape = pack_x(points, viewdirs)
        n_pad = x.shape[1]
        g6 = jnp.concatenate(
            [g_rgb.reshape(n, 3), g_sigma.reshape(n, 1)], axis=-1
        ).astype(jnp.float32)
        g8 = jnp.pad(g6, ((0, n_pad - n), (0, 4))).T     # (8, n_pad)
        # Backward tile: smaller than the forward's (it holds every layer's
        # activations in VMEM) but it MUST divide n_pad — a non-dividing
        # tile would truncate the grid and silently drop tail samples from
        # the gradients. n_pad is always a multiple of 128.
        bt = next(b for b in (512, 256, 128) if n_pad % b == 0)
        blob, aux = pack_params(params, dtype)
        dx, dblob, daux = _backward_t(blob, aux, x, g8, dtype, bt, True, interpret)
        dparams = unpack_grads(dblob, daux)
        dpoints = dx[0:3, :n].T.reshape(*batch_shape, 3)
        dvd_full = dx[3:6, :n].T.reshape(*batch_shape, 3)
        dviewdirs = _reduce_to_shape(dvd_full, viewdirs.shape)
        return dparams, dpoints, dviewdirs

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_nerf_mlp(
    params,
    points: jnp.ndarray,
    viewdirs: jnp.ndarray,
    *,
    x_freqs: int = 10,
    d_freqs: int = 4,
    dtype: str = "float32",
    tile: int = 1024,
    sigma_only: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for models.mlp.nerf_mlp.

    points (..., 3), viewdirs broadcastable (..., 3) -> (rgb (..., 3),
    sigma (...,)), float32. Differentiable (custom VJP). With
    ``sigma_only`` the rgb output is zeros and the color branch is
    skipped (the coarse pass discards colors, lib.rs:404).

    $NERF_FUSED_INTERLEAVE=1 (A/B flag, PLAN.md item 3) splits each
    forward tile into two independent chains so Mosaic can overlap one
    half's VPU epilogues with the other's MXU matmuls; read per call so
    in-process A/B toggles take effect (it is part of the op cache key).
    $NERF_FUSED_TILE overrides the batch-tile width (multiple of 128):
    bigger tiles amortize per-step overhead against VMEM pressure — an
    A/B knob for the same sweep.
    """
    interleave = os.environ.get("NERF_FUSED_INTERLEAVE", "0") == "1"
    tile_env = os.environ.get("NERF_FUSED_TILE")
    if tile_env:
        tile = int(tile_env)
    op = _make_op(x_freqs, d_freqs, str(dtype), tile, bool(sigma_only),
                  interleave)
    return op(params, points, viewdirs)
