"""Fused Pallas TPU kernel: positional encode + the full NeRF MLP.

Replaces the reference's per-layer GEMM chain (Layer::forward_matrix,
/root/reference/src/network.rs:62-170, 13 matmuls per batch with every
activation round-tripping through memory) with ONE kernel per batch tile:
activations never leave VMEM and weights are DMA'd to VMEM exactly once
per launch.

Design notes (v3 — TPU-first, measured on v5e; v3 generalizes the blob
layout, kernel chain, backward, and grad unpacking over the whole
128-aligned ArchConfig family — the arch is inferred from the params at
trace time and keys the op cache, so distillation students get the same
fused path as the canonical network):

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
# sublane axis. Offsets are multiples of 16 so bf16 sublane slicing stays
# tile-aligned. The layout is parametric over the ArchConfig family
# (trunk width W, view width V, depth D, skip_at S) with the alignment
# rule: K is always a multiple of 128 — lane slices at non-128 boundaries
# force Mosaic relayout copies (a K=64 dense0 measured SLOWER than a
# K=256 layer). Sub-width inputs are zero-padded in the weight columns
# instead (e.g. dense0 consumes the full 128-row encode buffer; a V=64
# view branch rides in a 128-row activation whose padded rows stay zero).
import collections

_Layout = collections.namedtuple(
    "_Layout",
    ["width", "v_width", "depth", "skip_at",  # TRUE arch dims
     "wp", "vp",          # padded trunk/view widths (multiples of 128)
     "lanes",             # blob lane width = max K
     "slots",             # name -> (offset, rows, klanes)
     "blob_rows", "aux_rows", "bias_cols",
     "b_bneck", "b_view", "b_sigma", "b_rgb"],  # bias column indices
)


def infer_arch(params) -> Tuple[int, int, int, int]:
    """(width, v_width, depth, skip_at) from a param pytree. skip_at is
    detected from the one dense layer whose input exceeds the trunk width
    (the encoded input re-concat, network.rs:210-211)."""
    depth = sum(1 for k in params if k.startswith("dense"))
    width = int(params["dense0"]["kernel"].shape[1])
    v_width = int(params["viewdirs"]["kernel"].shape[1])
    skip_at = depth - 1  # no skip found -> place sentinel past the loop
    for i in range(1, depth):
        if int(params[f"dense{i}"]["kernel"].shape[0]) > width:
            skip_at = i - 1
            break
    return width, v_width, depth, skip_at


def supports_arch(params_or_arch) -> bool:
    """Can the fused kernel serve this family member? Requires the trunk
    width to be a multiple of 128 (MXU lane alignment) and the canonical
    L=(10,4) encodings (checked separately at op build)."""
    if isinstance(params_or_arch, tuple):
        w, v, d, s = params_or_arch
    else:
        try:
            w, v, d, s = infer_arch(params_or_arch)
        except (KeyError, AttributeError, IndexError):
            return False
    return (w % 128 == 0 and w >= 128 and v >= 16 and d >= 2
            and 0 <= s < d)


@functools.lru_cache(maxsize=None)
def _layout(width: int, v_width: int, depth: int, skip_at: int) -> _Layout:
    if not supports_arch((width, v_width, depth, skip_at)):
        raise ValueError(
            f"fused kernel needs trunk width % 128 == 0 (MXU lane "
            f"alignment); arch ({width},{v_width},{depth},{skip_at}) must "
            "run with impl='xla'")
    wp = width                          # already a 128-multiple
    vp = -(-v_width // LANES) * LANES   # pad view branch rows to 128
    lanes = max(wp, vp, LANES)          # max K across slots (the skip
    #                                     layer sums two matmuls, so K
    #                                     never exceeds max(wp, 128))
    slots = {}
    off = 0

    def add(name, rows, klanes):
        nonlocal off
        slots[name] = (off, rows, klanes)
        off += rows

    add("w0t", wp, LANES)               # dense0: K = encode buffer (128)
    for i in range(1, depth):
        if i == skip_at + 1:
            add(f"w{i}at", wp, LANES)   # skip rows: K = encode buffer
            add(f"w{i}bt", wp, wp)      # trunk rows
        else:
            add(f"w{i}t", wp, wp)
    add("wbt", wp, wp)                  # bottleneck
    add("wvat", vp, wp)                 # viewdirs rows for bottleneck
    add("wvbt", vp, LANES)              # viewdirs dir rows (encode buffer)
    add("wst", 16, wp)                  # sigma head: alpha^T at out row 3
    add("wrt", 16, vp)                  # rgb head: rgb^T at out rows 0:3
    # Bias-table columns depth+4.. additionally carry the HEAD WEIGHTS as
    # COLUMN vectors (alpha (wp,), rgb[:,0..2] (vp,)) for the heads-on-VPU
    # forward variant ($NERF_FUSED_HEADS=vpu): the 16-row head matmuls run
    # as padded 128-row MXU passes, and a VPU multiply + sublane-reduce
    # does the same contraction off the MXU. The backward keeps the blob
    # slots (these columns get zero daux grads, never unpacked).
    bias_cols = depth + 8
    return _Layout(width=width, v_width=v_width, depth=depth,
                   skip_at=skip_at, wp=wp, vp=vp, lanes=lanes, slots=slots,
                   blob_rows=off, aux_rows=LANES + max(wp, vp),
                   bias_cols=bias_cols, b_bneck=depth, b_view=depth + 1,
                   b_sigma=depth + 2, b_rgb=depth + 3)


_CANONICAL_LAYOUT = _layout(_H, _VH, 8, 4)

# --- aux blob (always f32): encode projection + bias table.
_AUX_G_ROWS = LANES                       # rows 0:128, lanes 0:8 = G
_AUX_B_OFF = LANES                        # rows 128:, lanes 0:bias_cols
# Canonical-layout constants (kept for tests/back-compat):
_BLOB_ROWS = _CANONICAL_LAYOUT.blob_rows  # 2848
_AUX_ROWS = _CANONICAL_LAYOUT.aux_rows    # 384
_BIAS_COLS = _CANONICAL_LAYOUT.bias_cols  # 12: dense0..7 -> 0..7,
#                  bottleneck -> 8, viewdirs -> 9,
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


# Odd minimax polynomial for sin(2*pi*u), u in [-0.5, 0.5] (period-1
# "turns" argument): max abs error 1.7e-5 — two decades below bf16 output
# rounding (~4e-3). Fitted by least squares on a dense grid (degree 9).
_SINPOLY = (6.283088463027395, -41.33324754221887, 81.40008976706686,
            -74.67588386951022, 33.16809461334938)
_INV_2PI = float(1.0 / (2.0 * np.pi))


def _sinpoly_turns(u):
    """sin(2*pi*u) for arbitrary u (one round() range reduction + degree-9
    odd Horner — ~9 VPU ops vs the ~10 ms/tile libm sin pass it replaces,
    measured v5e 2026-08-20: transcendentals were 28% of the kernel)."""
    u = u - jnp.round(u)
    u2 = u * u
    p = jnp.float32(_SINPOLY[4])
    for c in (_SINPOLY[3], _SINPOLY[2], _SINPOLY[1], _SINPOLY[0]):
        p = p * u2 + jnp.float32(c)
    return p * u


def _encode_raw_vpu(x, turns=False):
    """The encode projection WITHOUT the MXU: raw[r, :] = 2^band(r) *
    x[axis(r), :], built from sublane broadcasts + selects + one multiply.

    Numerically IDENTICAL to the (128, 8) f32-HIGHEST matmul it replaces:
    every G row has exactly ONE nonzero entry (a power of two), so the
    matmul computes a single exact product per row — as does this. The
    point is MXU time: f32 HIGHEST runs the MXU in multi-pass mode, and
    the K=8 shape keeps the systolic array nearly empty; the VPU does the
    same work in ~a dozen vector ops off the matmul critical path
    ($NERF_FUSED_ENC=vpu, A/B measured on v5e)."""
    f32 = jnp.float32
    shape = (LANES, x.shape[1])
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    # Band index k (scale = 2^k): identity rows clamp to k=0 -> scale 1.
    k = jnp.maximum(jnp.where(r < _DOFF, r - 3, r - (_DOFF + 3)) // 6, 0)
    # Exact 2^k: bitcast (127+k) << 23 — exp2/pow are polynomial approx
    # and must not perturb the encode (the matmul path is exact).
    scale = jax.lax.bitcast_convert_type(
        ((k + 127) << 23).astype(jnp.int32), f32)
    if turns:
        # Trig rows carry 2^k/(2*pi) * coord (the period-1 argument
        # _sinpoly_turns wants); identity rows keep the plain coordinate.
        # The 1/(2*pi) fold costs one f32 rounding (~1e-7 relative) —
        # invisible under bf16, so the poly-trig path is bf16-mode-only.
        ident = (r < 3) | ((r >= _DOFF) & (r < _DOFF + 3))
        scale = jnp.where(ident, scale, scale * jnp.float32(_INV_2PI))
    # Source coordinate index 0..5 (px py pz dx dy dz).
    axis = jnp.where(
        r < _DOFF,
        jnp.where(r < 3, r, (r - 3) % 3),
        jnp.where(r < _DOFF + 3, r - _DOFF + 3, (r - (_DOFF + 3)) % 3 + 3))
    val = jnp.broadcast_to(x[0:1, :], shape).astype(f32)
    for c in range(1, 6):
        val = jnp.where(axis == c,
                        jnp.broadcast_to(x[c:c + 1, :], shape), val)
    return scale * val


def pack_params(params, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack the param pytree into (blob (rows, lanes) dtype, aux f32).

    The blob holds every weight transposed to (out, in); aux holds the
    encode projection and the bias table (column j = layer j's bias).
    The layout is derived from the params' own architecture (any
    128-aligned ArchConfig member); canonical lego packs to the original
    (2848, 256) / (384, 256) blobs.
    """
    # Built with pure pad/transpose/concat — dynamic_update_slice / scatter
    # formulations measured ~70 ms on v5e for this same packing (tiny strided
    # scatters serialize); this version is sub-ms.
    L = _layout(*infer_arch(params))
    cdt = jnp.dtype(dtype)
    k = lambda name: jnp.asarray(params[name]["kernel"], jnp.float32)
    b = lambda name: jnp.asarray(params[name]["bias"], jnp.float32)

    # Skip layer (if any): skip_at == depth-1 is the no-skip sentinel
    # (infer_arch found no layer consuming the re-concat), so dense{D}
    # does not exist and no skip slots were laid out.
    if L.skip_at + 1 < L.depth:
        ds = k(f"dense{L.skip_at + 1}")  # (enc+W, W), encoded-input rows
        #                                  FIRST (lib.rs:133-152)
    vw = k("viewdirs")               # (W+27, V), bottleneck rows FIRST

    def slot(name, w_t):
        off, rows, _ = L.slots[name]
        return jnp.pad(w_t, ((0, rows - w_t.shape[0]),
                             (0, L.lanes - w_t.shape[1])))

    pieces = [slot("w0t", k("dense0").T)]
    for i in range(1, L.depth):
        if i == L.skip_at + 1:
            pieces.append(slot(f"w{i}at", ds[:_XE].T))
            pieces.append(slot(f"w{i}bt", ds[_XE:].T))
        else:
            pieces.append(slot(f"w{i}t", k(f"dense{i}").T))
    pieces += [
        slot("wbt", k("bottleneck").T),
        slot("wvat", vw[:L.width].T),
        # dir-encoding rows land at input columns _DOFF:_DOFF+27 so the
        # matmul consumes the full 128-row encode buffer (K=128 aligned)
        slot("wvbt", jnp.pad(vw[L.width:].T, ((0, 0), (_DOFF, 0)))),
        # heads: alpha lands at out row 3, rgb at out rows 0:2
        slot("wst", jnp.pad(k("alpha").T, ((3, 0), (0, 0)))),
        slot("wrt", k("rgb").T),
    ]
    blob = jnp.concatenate(pieces, axis=0).astype(cdt)
    assert blob.shape == (L.blob_rows, L.lanes), blob.shape

    h_bias = L.aux_rows - _AUX_B_OFF

    def bias_col(v, top=0):
        return jnp.pad(v, (top, h_bias - top - v.shape[0]))

    bias_tab = jnp.stack(
        [bias_col(b(f"dense{i}")) for i in range(L.depth)]
        + [bias_col(b("bottleneck")), bias_col(b("viewdirs")),
           bias_col(b("alpha"), top=3), bias_col(b("rgb"))]
        # Head weights as columns for the heads-on-VPU variant (see
        # _layout): alpha (W,), then rgb[:, 0..2] (V,) each — rounded
        # through the compute dtype so the VPU contraction multiplies
        # the SAME weight values as the matmul heads and the backward
        # recompute (bf16 h x bf16-rounded w, f32 products both ways;
        # only the f32 summation order differs).
        + [bias_col(k("alpha")[:, 0].astype(cdt).astype(jnp.float32))]
        + [bias_col(k("rgb")[:, c].astype(cdt).astype(jnp.float32))
           for c in range(3)],
        axis=1,
    )  # (h_bias, bias_cols)
    aux = jnp.concatenate(
        [
            jnp.pad(jnp.asarray(_encode_projection()),
                    ((0, 0), (0, L.lanes - 8))),
            jnp.pad(bias_tab, ((0, 0), (0, L.lanes - L.bias_cols))),
        ],
        axis=0,
    )
    assert aux.shape == (L.aux_rows, L.lanes), aux.shape
    return blob, aux


def _kernel_body(L, cdt, sigma_only, fast_cos, interleave, enc_vpu, epi_bf16,
                 trig_poly, heads_vpu,
                 x_ref, blob_ref, aux_ref, out_ref, ws, wa, sems):
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp_w = pltpu.make_async_copy(blob_ref, ws, sems.at[0])
        cp_a = pltpu.make_async_copy(aux_ref, wa, sems.at[1])
        cp_w.start()
        cp_a.start()
        cp_w.wait()
        cp_a.wait()

    kw = dict(enc_vpu=enc_vpu, epi_bf16=epi_bf16, trig_poly=trig_poly,
              heads_vpu=heads_vpu)
    if interleave:
        # Two independent half-tile chains: gives Mosaic's scheduler
        # MXU-independent VPU work (encode/epilogues of one half can
        # overlap matmuls of the other).
        t = x_ref.shape[1] // 2
        out_ref[:, 0:t] = _mlp_chain(L, cdt, sigma_only, fast_cos,
                                     x_ref[:, 0:t], ws, wa, **kw)
        out_ref[:, t:2 * t] = _mlp_chain(L, cdt, sigma_only, fast_cos,
                                         x_ref[:, t:2 * t], ws, wa, **kw)
    else:
        out_ref[:] = _mlp_chain(L, cdt, sigma_only, fast_cos, x_ref[:],
                                ws, wa, **kw)


def _mlp_chain(L, cdt, sigma_only, fast_cos, x, ws, wa,
               enc_vpu=False, epi_bf16=False, trig_poly=False,
               heads_vpu=False):
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    prec = hi if cdt == f32 else None
    # Layer epilogues in the compute dtype ($NERF_FUSED_EPI=bf16): the MXU
    # emits cdt directly (accumulation is f32 inside the MXU either way),
    # bias-add/relu run as bf16 vector ops and the per-layer f32->bf16
    # cast pass disappears — halves the VPU work between dependent
    # matmuls. f32 (oracle-parity) mode keeps full-precision epilogues.
    # (Measured 2026-08-20: Mosaic's tpu.matmul REJECTS a bf16 accumulator
    # — the knob stays for a future toolchain, current default f32.)
    epi_bf16 = epi_bf16 and cdt != f32
    acc_dt = cdt if epi_bf16 else f32
    trig_poly = trig_poly and cdt != f32             # bf16 fast path only
    if enc_vpu:
        raw = _encode_raw_vpu(x, turns=trig_poly)    # (128, T) f32, exact
    else:
        g = wa[0:LANES, 0:8]                         # (128, 8) f32
        raw = jnp.dot(g, x, preferred_element_type=f32, precision=hi)

    ident, is_sin = _row_selectors(raw.shape)
    if trig_poly:
        # Period-1 polynomial trig ($NERF_FUSED_TRIG=poly): raw's trig rows
        # are in TURNS (encode folded 1/(2*pi)); cos rows add 0.25 turns.
        # Max poly error 1.7e-5 vs bf16 output rounding ~4e-3. Measured
        # v5e: the libm sin pass was ~28% of the whole kernel. (All 128
        # rows — a rows-0:96 slice+concat variant that skips the padding
        # rows SIGABRTs the Mosaic compiler, probed 2026-08-20.)
        # With the MXU encode ($NERF_FUSED_ENC=mxu) raw is in RADIANS;
        # one multiply converts — an A/B for narrow (VPU-bound) archs
        # where shifting encode work onto the idle MXU can win.
        rt = raw if enc_vpu else raw * jnp.float32(_INV_2PI)
        u = rt + jnp.where(is_sin, 0.0, jnp.float32(0.25))
        enc = jnp.where(ident, raw, _sinpoly_turns(u)).astype(cdt)
    elif fast_cos:
        # cos(x) = sin(x + pi/2): one transcendental pass. Arg error from
        # the f32 phase add is ~1e-4 at |x|<=2048 — far below bf16 noise.
        tr = jnp.sin(raw + jnp.where(is_sin, 0.0, np.float32(np.pi / 2)))
        enc = jnp.where(ident, raw, tr).astype(cdt)
    else:
        tr = jnp.where(is_sin, jnp.sin(raw), jnp.cos(raw))
        enc = jnp.where(ident, raw, tr).astype(cdt)

    def lay(name, h, bias_col, relu=True, out_f32=False):
        off, rows, klanes = L.slots[name]
        pet = f32 if out_f32 else acc_dt
        acc = jnp.dot(ws[off:off + rows, 0:klanes], h,
                      preferred_element_type=pet, precision=prec)
        b = wa[_AUX_B_OFF:_AUX_B_OFF + rows, bias_col:bias_col + 1]
        acc = acc + b.astype(pet)
        return jnp.maximum(acc, 0.0) if relu else acc

    def lay2(na, ha, nb, hb, bias_col, relu=True):
        offa, rows, ka = L.slots[na]
        offb, _, kb = L.slots[nb]
        acc = jnp.dot(ws[offa:offa + rows, 0:ka], ha,
                      preferred_element_type=acc_dt, precision=prec)
        acc = acc + jnp.dot(ws[offb:offb + rows, 0:kb], hb,
                            preferred_element_type=acc_dt, precision=prec)
        b = wa[_AUX_B_OFF:_AUX_B_OFF + rows, bias_col:bias_col + 1]
        acc = acc + b.astype(acc_dt)
        return jnp.maximum(acc, 0.0) if relu else acc

    h = lay("w0t", enc, 0).astype(cdt)
    for i in range(1, L.depth):
        if i == L.skip_at + 1:  # skip concat (network.rs:210-211)
            h = lay2(f"w{i}at", enc, f"w{i}bt", h, i).astype(cdt)
        else:
            h = lay(f"w{i}t", h, i).astype(cdt)

    # Heads stay f32 (the (8, T) output stripe is f32 either way).
    # $NERF_FUSED_HEADS=vpu (bf16 mode): the 16-row head matmuls cost a
    # full padded 128-row MXU pass each (~7% of kernel MXU time); the
    # same contractions run as VPU multiply + sublane-reduce against the
    # head-weight COLUMNS packed into the aux bias table (_layout).
    heads_vpu = heads_vpu and cdt != f32
    row_shape = (8, x.shape[1])
    row = jax.lax.broadcasted_iota(jnp.int32, row_shape, 0)

    def vpu_head(hin, wcol_idx, n_in, bias_row, bias_col):
        wcol = wa[_AUX_B_OFF:_AUX_B_OFF + n_in, wcol_idx:wcol_idx + 1]
        s = jnp.sum(hin.astype(f32) * wcol, axis=0, keepdims=True)
        return s + wa[_AUX_B_OFF + bias_row:_AUX_B_OFF + bias_row + 1,
                      bias_col:bias_col + 1]

    b_acol = L.bias_cols - 4          # alpha column; rgb cols follow

    if heads_vpu:
        sig1 = jnp.maximum(vpu_head(h, b_acol, L.wp, 3, L.b_sigma), 0.0)
        sig8 = jnp.where(row == 3, jnp.broadcast_to(sig1, row_shape), 0.0)
    else:
        sig8 = lay("wst", h, L.b_sigma, out_f32=True)[0:8]  # row 3 = sigma

    if sigma_only:
        return jnp.where(row == 3, sig8, 0.0)

    bneck = lay("wbt", h, L.b_bneck, relu=False).astype(cdt)
    hv = lay2("wvat", bneck, "wvbt", enc, L.b_view).astype(cdt)
    if heads_vpu:
        r0 = vpu_head(hv, b_acol + 1, L.vp, 0, L.b_rgb)
        r1 = vpu_head(hv, b_acol + 2, L.vp, 1, L.b_rgb)
        r2 = vpu_head(hv, b_acol + 3, L.vp, 2, L.b_rgb)
        pre = jnp.where(row == 0, jnp.broadcast_to(r0, row_shape),
                        jnp.where(row == 1, jnp.broadcast_to(r1, row_shape),
                                  jnp.where(row == 2,
                                            jnp.broadcast_to(r2, row_shape),
                                            0.0)))
        rgb8 = jax.nn.sigmoid(pre)
    else:
        rgb8 = jax.nn.sigmoid(
            lay("wrt", hv, L.b_rgb, relu=False, out_f32=True)[0:8])  # rows 0:2
    return jnp.where(row == 3, sig8, jnp.where(row < 3, rgb8, 0.0))


def _kernel_bwd(L, cdt, fast_cos, enc_vpu, trig_poly,
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
    trig_poly = trig_poly and cdt != f32
    if enc_vpu:
        raw = _encode_raw_vpu(x, turns=trig_poly)
    else:
        raw = jnp.dot(gproj, x, preferred_element_type=f32, precision=hi)
    ident, is_sin = _row_selectors(raw.shape)
    if trig_poly:
        # Matches the forward's poly path; the derivative w.r.t. the
        # RADIAN argument is cos = sin(+0.25 turns), so denc_draw composes
        # with the radian-scaled gproj in the dx projection unchanged
        # (enc(x) = sin(2^k x) either way — only the parameterization of
        # the recompute changed).
        rt = raw if enc_vpu else raw * jnp.float32(_INV_2PI)
        u = rt + jnp.where(is_sin, 0.0, jnp.float32(0.25))
        tr = _sinpoly_turns(u)
        dtr = _sinpoly_turns(u + jnp.float32(0.25))
    elif fast_cos:
        phase = jnp.where(is_sin, 0.0, np.float32(np.pi / 2))
        tr = jnp.sin(raw + phase)
        dtr = jnp.cos(raw + phase)
    else:
        tr = jnp.where(is_sin, jnp.sin(raw), jnp.cos(raw))
        dtr = jnp.where(is_sin, jnp.cos(raw), -jnp.sin(raw))
    enc = jnp.where(ident, raw, tr).astype(cdt)
    denc_draw = jnp.where(ident, 1.0, dtr)          # d(enc)/d(raw_rad), f32

    def w(name):
        off, rows, _ = L.slots[name]
        return ws[off:off + rows]

    def bias(col, rows):
        return wa[_AUX_B_OFF:_AUX_B_OFF + rows, col:col + 1]

    def fl(name, h, bias_col, relu=True, add=None):
        rows = L.slots[name][1]
        acc = jnp.dot(w(name)[:, : h.shape[0]], h,
                      preferred_element_type=f32, precision=prec)
        if add is not None:
            acc = acc + add
        acc = acc + bias(bias_col, rows)
        return jnp.maximum(acc, 0.0) if relu else acc

    def mm(name, h):
        return jnp.dot(w(name)[:, : h.shape[0]], h,
                       preferred_element_type=f32, precision=prec)

    # Trunk recompute, keeping every layer's OUTPUT (hs[i] = dense{i} out;
    # the input to dense{i} is hs[i-1]) — all VMEM-resident.
    D, S = L.depth, L.skip_at
    hs = [fl("w0t", enc, 0).astype(cdt)]
    for i in range(1, D):
        if i == S + 1:
            hs.append(fl(f"w{i}bt", hs[-1], i,
                         add=mm(f"w{i}at", enc)).astype(cdt))
        else:
            hs.append(fl(f"w{i}t", hs[-1], i).astype(cdt))
    h_last = hs[-1]
    s8 = fl("wst", h_last, L.b_sigma, relu=False)    # (16, T) f32
    bn = fl("wbt", h_last, L.b_bneck, relu=False).astype(cdt)
    hv = fl("wvat", bn, L.b_view, add=mm("wvbt", enc)).astype(cdt)
    r8 = fl("wrt", hv, L.b_rgb, relu=False)          # (16, T) f32

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
        off, rows, _ = L.slots[name]
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
        # (rows, lanes weight)^T @ dh -> gradient w.r.t. the layer input
        return jax.lax.dot_general(w(name), dh, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32, precision=prec)

    def relu_mask(h):
        # ReLU mask for the backward. Compare in f32: Mosaic on v5e rejects
        # bf16 vector comparisons ("Target does not support this
        # comparison", first real-TPU bf16-bwd compile 2026-08-18); the
        # extend-to-f32 is free next to the surrounding matmuls.
        return h.astype(f32) > 0

    acc_w("wrt", dr8, hv)
    acc_b(L.b_rgb, dr8)
    dhv = (bwd_in("wrt", dr8)[:L.vp] * relu_mask(hv)).astype(cdt)
    acc_w("wvat", dhv, bn)
    acc_w("wvbt", dhv, enc)
    acc_b(L.b_view, dhv)
    dbn = bwd_in("wvat", dhv).astype(cdt)            # bottleneck: no relu
    de = bwd_in("wvbt", dhv)[:LANES]                 # f32 (128, T)
    acc_w("wbt", dbn, h_last)
    acc_b(L.b_bneck, dbn)
    acc_w("wst", ds8, h_last)
    acc_b(L.b_sigma, ds8)
    dh = ((bwd_in("wbt", dbn) + bwd_in("wst", ds8))
          * relu_mask(h_last)).astype(cdt)
    for i in range(D - 1, 0, -1):
        hin = hs[i - 1]
        if i == S + 1:
            acc_w(f"w{i}bt", dh, hin)
            acc_w(f"w{i}at", dh, enc)
            acc_b(i, dh)
            de = de + bwd_in(f"w{i}at", dh)[:LANES]
            dh = (bwd_in(f"w{i}bt", dh) * relu_mask(hin)).astype(cdt)
        else:
            acc_w(f"w{i}t", dh, hin)
            acc_b(i, dh)
            dh = (bwd_in(f"w{i}t", dh) * relu_mask(hin)).astype(cdt)
    acc_w("w0t", dh, enc)
    acc_b(0, dh)
    de = de + bwd_in("w0t", dh)[:LANES]

    draw = de * denc_draw
    dx_ref[:] = jax.lax.dot_general(gproj, draw, (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32, precision=hi)


def _backward_t(blob, aux, x, g, dtype, tile, fast_cos, interpret,
                layout: _Layout = None, enc_vpu=False, trig_poly=False):
    """x, g: (8, N) f32 -> (dx (8, N) f32, dblob, daux f32 grads)."""
    L = layout or _CANONICAL_LAYOUT
    cdt = jnp.dtype(dtype)
    n = x.shape[1]
    grid = n // tile
    data_spec = pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    full_out = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_bwd, L, cdt,
                               fast_cos and cdt != jnp.float32,
                               enc_vpu, trig_poly)
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
            full_out((L.blob_rows, L.lanes)),
            full_out((L.aux_rows, L.lanes)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((L.blob_rows, L.lanes), jnp.float32),
            jax.ShapeDtypeStruct((L.aux_rows, L.lanes), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((L.blob_rows, L.lanes), cdt),
            pltpu.VMEM((L.aux_rows, L.lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * _flops(L, sigma_only=False) * n,
            bytes_accessed=n * 8 * 16 + 2 * L.blob_rows * L.lanes * 4,
            transcendentals=n * LANES,
        ),
        interpret=interpret,
    )(x, g, blob, aux)


def unpack_grads(dblob: jnp.ndarray, daux: jnp.ndarray,
                 layout: _Layout = None):
    """Map packed blob/aux gradients back to the param-pytree layout."""
    L = layout or _CANONICAL_LAYOUT
    W, V, D, S = L.width, L.v_width, L.depth, L.skip_at

    def g(name):
        off, rows, _ = L.slots[name]
        return dblob[off:off + rows]

    bt = daux[_AUX_B_OFF:]

    def gb(col, n, top=0):
        return bt[top:top + n, col]

    out = {"dense0": {"kernel": g("w0t")[:, :_XE].T, "bias": gb(0, W)}}
    for i in range(1, D):
        if i == S + 1:
            out[f"dense{i}"] = {
                "kernel": jnp.concatenate(
                    [g(f"w{i}at")[:, :_XE].T, g(f"w{i}bt")[:, :W].T], axis=0),
                "bias": gb(i, W),
            }
        else:
            out[f"dense{i}"] = {"kernel": g(f"w{i}t")[:, :W].T,
                                "bias": gb(i, W)}
    out["bottleneck"] = {"kernel": g("wbt")[:, :W].T, "bias": gb(L.b_bneck, W)}
    out["viewdirs"] = {
        "kernel": jnp.concatenate(
            [g("wvat")[:V, :W].T, g("wvbt")[:V, _DOFF:_DOFF + _DE].T], axis=0
        ),
        "bias": gb(L.b_view, V),
    }
    out["alpha"] = {"kernel": g("wst")[3, :W][:, None],
                    "bias": gb(L.b_sigma, 1, top=3)}
    out["rgb"] = {"kernel": g("wrt")[0:3, :V].T, "bias": gb(L.b_rgb, 3)}
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


def _flops(L: _Layout, sigma_only: bool) -> int:
    """MXU FLOPs per sample (batch column) for the cost model: 2*K*rows
    summed over the slots actually used (sigma-only skips the color
    branch). True (unpadded) K values: encode consumers see 64/32 useful
    lanes of the 128-row buffer."""
    trunk = 2 * (LANES * 8 + 2 * L.wp * 64 + 16 * L.wp
                 + (L.depth - 2) * L.wp * L.wp + L.wp * L.wp)  # +skip b
    if sigma_only:
        return trunk
    return trunk + 2 * (L.wp * L.wp                    # bottleneck
                        + L.vp * L.wp + L.vp * 32      # wvat, wvbt
                        + 16 * L.vp)                   # rgb head


# Canonical-layout constants (kept for back-compat / docs):
_FLOPS_FULL = _flops(_CANONICAL_LAYOUT, False)
_FLOPS_SIGMA = _flops(_CANONICAL_LAYOUT, True)


def _forward_t(blob, aux, x, dtype, tile, sigma_only, fast_cos, interpret,
               interleave=False, layout: _Layout = None,
               enc_vpu=False, epi_bf16=False, trig_poly=False,
               heads_vpu=False):
    """x: (8, N) f32, N a multiple of ``tile`` -> (8, N) f32 out
    [rows 0-2 rgb, row 3 sigma]."""
    L = layout or _CANONICAL_LAYOUT
    cdt = jnp.dtype(dtype)
    n = x.shape[1]
    grid = n // tile
    interleave = interleave and tile % 256 == 0
    data_spec = pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_body, L, cdt, sigma_only,
                               fast_cos and cdt != jnp.float32, interleave,
                               enc_vpu, epi_bf16, trig_poly, heads_vpu)
    flops = _flops(L, sigma_only) * n
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
            pltpu.VMEM((L.blob_rows, L.lanes), cdt),
            pltpu.VMEM((L.aux_rows, L.lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),     # sequential: step-0 DMA
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * 8 * 8 + L.blob_rows * L.lanes * cdt.itemsize,
            transcendentals=n * LANES,
        ),
        interpret=interpret,
    )(x, blob, aux)


from nerf_rs_tpu.utils import round_up as _round_up


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _make_op(x_freqs: int, d_freqs: int, dtype: str, tile: int, sigma_only: bool,
             interleave: bool, arch: Tuple[int, int, int, int] = (_H, _VH, 8, 4),
             enc_vpu: bool = False, epi_bf16: bool = False,
             trig_poly: bool = False, heads_vpu: bool = False):
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
    layout = _layout(*arch)   # raises ValueError for unsupported archs
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
                         interleave=interleave, layout=layout,
                         enc_vpu=enc_vpu, epi_bf16=epi_bf16,
                         trig_poly=trig_poly, heads_vpu=heads_vpu)
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
        # the gradients. n_pad is always a multiple of 128. The cap is
        # dtype-aware: the canonical-arch bwd at tile 512/f32 measured a
        # 31.2 MB Mosaic stack vs the 16 MB scoped-VMEM limit on v5e
        # (first real-TPU compile, 2026-08-18), so f32 stays at 128.
        # $NERF_FUSED_BWD_TILE overrides for A/B.
        bt_env = os.environ.get("NERF_FUSED_BWD_TILE")
        if bt_env:
            bt_cap = int(bt_env)
        elif jnp.dtype(dtype) == jnp.float32:
            bt_cap = 128
        else:
            # Round-5 re-search (v5e, poly-trig path, 2026-08-20): bf16
            # bwd compiles and WINS well past the old 256 cap — teacher
            # 107.96 ms @ 256 -> 79.90 @ 1024 (2048 fails to compile);
            # student-128 keeps gaining to 2048 (15.60 -> 14.78 ms).
            # Both measured points sit at the SAME activation footprint
            # wp*bt = 256*1024, so the cap scales inversely with trunk
            # width for the rest of the family (a wp=512 student at a
            # flat 1024 would double the footprint the teacher already
            # fails at) — $NERF_FUSED_BWD_TILE overrides for re-search.
            bt_cap = max(128, ((256 * 1024 // layout.wp) // 128) * 128)
        bt = next(b for b in (bt_cap, 1024, 512, 256, 128)
                  if b <= bt_cap and n_pad % b == 0)
        blob, aux = pack_params(params, dtype)
        dx, dblob, daux = _backward_t(blob, aux, x, g8, dtype, bt, True,
                                      interpret, layout=layout,
                                      enc_vpu=enc_vpu, trig_poly=trig_poly)
        dparams = unpack_grads(dblob, daux, layout=layout)
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
    tile: int | None = None,
    sigma_only: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for models.mlp.nerf_mlp.

    points (..., 3), viewdirs broadcastable (..., 3) -> (rgb (..., 3),
    sigma (...,)), float32. Differentiable (custom VJP). With
    ``sigma_only`` the rgb output is zeros and the color branch is
    skipped (the coarse pass discards colors, lib.rs:404).

    Serves the whole 128-aligned ArchConfig family — the architecture is
    inferred from the params (infer_arch) and the blob layout, kernel
    chain, and backward specialize to it at trace time. Unaligned archs
    (width % 128 != 0) raise ValueError; gate with supports_arch and fall
    back to impl='xla'.

    $NERF_FUSED_INTERLEAVE=1 (A/B flag, PLAN.md item 3) splits each
    forward tile into two independent chains so Mosaic can overlap one
    half's VPU epilogues with the other's MXU matmuls; read per call so
    in-process A/B toggles take effect (it is part of the op cache key).
    $NERF_FUSED_TILE overrides the batch-tile width (multiple of 128):
    bigger tiles amortize per-step overhead against VMEM pressure — an
    A/B knob for the same sweep.
    """
    interleave = os.environ.get("NERF_FUSED_INTERLEAVE", "0") == "1"
    arch = infer_arch(params)
    tile_env = os.environ.get("NERF_FUSED_TILE")
    if tile_env:
        tile = int(tile_env)
    elif tile is None:
        # Measured default (v5e, 2026-08-20, tools/kernel_variant_probe.py
        # with the round-5 poly-trig path): tile 4096 wins for BOTH the
        # canonical 256-wide arch (27.08 ms / 138 TFLOP/s at 16384x192 vs
        # 27.99 at 1024) and the student-128 (6.31 ms at 16384x64 vs 7.22
        # at 1024 - the narrow arch is per-step-overhead-bound). f32
        # (oracle-parity) mode stays at 1024: its full-width activations
        # measured a 21.74 MB Mosaic scoped-VMEM stack at 4096 vs the
        # 16 MB limit (distill teacher render, first f32-mode compile
        # after the 4096 flip, 2026-08-20).
        tile = 1024 if jnp.dtype(dtype) == jnp.float32 else 4096
    # Kernel-efficiency knobs (round-5 measurements, docs/PERF.md):
    # $NERF_FUSED_TRIG=poly (DEFAULT) swaps the libm sin pass (measured
    # ~28% of the whole kernel) for a period-1 degree-9 polynomial -
    # image-level lossless (120 dB vs the exact-bf16 render) and +40%/+61%
    # kernel speed (teacher/student); bf16 mode only (f32 oracle-parity
    # keeps exact trig), implies enc=vpu (turns-scaled encode).
    # $NERF_FUSED_ENC=vpu (DEFAULT) builds the encode args on the VPU
    # (numerically exact) instead of the K=8 f32-HIGHEST MXU pass.
    # $NERF_FUSED_EPI=bf16 would run layer epilogues in bf16, but Mosaic
    # currently rejects a bf16 matmul accumulator - knob kept for a
    # future toolchain. All are read per call (op-cache-keyed) so
    # in-process A/B toggles take effect.
    trig_poly = os.environ.get("NERF_FUSED_TRIG", "poly") == "poly"
    enc_vpu = os.environ.get("NERF_FUSED_ENC", "vpu") == "vpu"
    epi_bf16 = os.environ.get("NERF_FUSED_EPI", "f32") == "bf16"
    # $NERF_FUSED_HEADS=vpu (DEFAULT, bf16 only): 16-row head matmuls as
    # VPU reductions — each padded 128-row MXU head pass removed buys ~2%
    # (teacher 139.4 -> 141.8 TFLOP/s); image-lossless (120 dB vs the
    # matmul heads at 128px).
    heads_vpu = os.environ.get("NERF_FUSED_HEADS", "vpu") == "vpu"
    op = _make_op(x_freqs, d_freqs, str(dtype), tile, bool(sigma_only),
                  interleave, arch, enc_vpu, epi_bf16, trig_poly, heads_vpu)
    return op(params, points, viewdirs)
