"""Fused resampling kernel vs the XLA reference chain (interpret mode on
CPU; Mosaic-compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_rs_tpu.config import RenderConfig
from nerf_rs_tpu.ops.kernels.resample import fused_resample
from nerf_rs_tpu.ops.sampling import (
    _batched_uniform,
    importance_samples,
    merge_samples,
)
from nerf_rs_tpu.ops.volume import compute_weights


def _xla_chain(t_c, sigma_c, u, far, cfg):
    w_c = compute_weights(sigma_c, t_c, far, t_threshold=cfg.t_threshold)
    # importance_samples with the same uniforms the kernel gets: inline its
    # math (it normally draws u from a key).
    bins = 0.5 * (t_c[..., 1:] + t_c[..., :-1])
    pdf_w = jnp.maximum(w_c[..., 1:-1], 0.0) + cfg.pdf_eps
    pdf = pdf_w / jnp.sum(pdf_w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf[..., :-1],
                           jnp.ones_like(cdf[..., :1])], axis=-1)
    one_hot = ((u[..., :, None] >= cdf[..., None, :-1])
               & (u[..., :, None] < cdf[..., None, 1:])).astype(t_c.dtype)
    sel = jnp.einsum("...cb,...bk->...ck", one_hot,
                     jnp.stack([cdf[..., :-1], cdf[..., 1:],
                                bins[..., :-1], bins[..., 1:]], axis=-1))
    cdf_lo, cdf_hi, bin_lo, bin_hi = (sel[..., i] for i in range(4))
    frac = (u - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, cfg.cdf_eps)
    t_extra = bin_lo + (bin_hi - bin_lo) * frac
    return merge_samples(t_c, t_extra)


def _inputs(n, seed=0, spiky=False, nc=64, nf=128):
    rng = np.random.default_rng(seed)
    u01 = rng.uniform(size=(n, nc)).astype(np.float32)
    t_c = 2.0 + (np.arange(nc, dtype=np.float32) + u01) * (4.0 / nc)
    sigma = rng.uniform(0, 30.0 if spiky else 2.0, size=(n, nc)).astype(np.float32)
    if spiky:
        sigma[:, (nc * 5) // 8:] = 100.0  # trigger the T < 1e-4 early-out
    u = rng.uniform(size=(n, nf)).astype(np.float32)
    return jnp.asarray(t_c), jnp.asarray(sigma), jnp.asarray(u)


@pytest.mark.parametrize("nc,nf", [(64, 128), (32, 64)])
def test_fused_resample_matches_xla(nc, nf):
    cfg = RenderConfig()
    t_c, sigma, u = _inputs(96, seed=0, nc=nc, nf=nf)
    got = fused_resample(t_c, sigma, u, 6.0, t_threshold=cfg.t_threshold,
                         pdf_eps=cfg.pdf_eps, cdf_eps=cfg.cdf_eps)
    want = _xla_chain(t_c, sigma, u, jnp.float32(6.0), cfg)
    assert got.shape == (96, nc + nf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-5)


def test_fused_resample_rejects_unsupported_counts():
    for nc, nf in [(48, 96), (16, 32), (64, 100)]:
        with pytest.raises(NotImplementedError):
            fused_resample(jnp.zeros((4, nc)), jnp.zeros((4, nc)),
                           jnp.zeros((4, nf)), 6.0)


def test_fused_resample_spiky_early_out():
    """With saturating densities (T < 1e-4 early-out active), scan-order
    float noise can move a u across a bin boundary — allow a <1% tail of
    boundary flips but require everything else tight."""
    cfg = RenderConfig()
    t_c, sigma, u = _inputs(96, seed=1, spiky=True)
    got = np.asarray(fused_resample(t_c, sigma, u, 6.0))
    want = np.asarray(_xla_chain(t_c, sigma, u, jnp.float32(6.0), cfg))
    err = np.abs(got - want)
    assert (err > 1e-4).mean() < 0.01
    assert err.max() < 0.05  # flips land within the (small) bin width


def test_fused_resample_empty_batch():
    """0-ray batches short-circuit like the XLA path instead of dividing
    by a zero tile size."""
    out = fused_resample(jnp.zeros((0, 64)), jnp.zeros((0, 64)),
                         jnp.zeros((0, 128)), 6.0)
    assert out.shape == (0, 192)


def test_fused_resample_sorted_and_in_range():
    t_c, sigma, u = _inputs(64, seed=2)
    out = np.asarray(fused_resample(t_c, sigma, u, 6.0))
    assert (np.diff(out, axis=-1) >= 0).all()
    assert (out >= 2.0 - 1e-5).all() and (out <= 6.0 + 1e-5).all()


@pytest.mark.parametrize("nc,nf", [(64, 128), (32, 64)])
def test_render_with_fused_sampling_close_to_xla(lego_params, golden, nc, nf):
    """End-to-end: the pallas sampling path renders the same image as the
    XLA path (same uniforms, different scan orderings -> allclose), at the
    native and the reduced (wasm, src/lib.rs:603-612) sample presets."""
    from nerf_rs_tpu.io.golden import camera_from_golden
    from nerf_rs_tpu.render import render_image

    cam = camera_from_golden(golden)
    key = jax.random.key(7)
    base = RenderConfig(n_coarse=nc, n_fine=nf, ray_chunk=256)
    img_x = render_image(lego_params["coarse"], lego_params["fine"], cam,
                         8, 8, key, base)
    img_p = render_image(lego_params["coarse"], lego_params["fine"], cam,
                         8, 8, key, base.replace(sampling_impl="pallas"))
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=2e-3)


def test_render_fused_sampling_gradient_parity(lego_params, golden):
    """Differentiating through the pallas sampling path must route the same
    gradients as the XLA path: the XLA path stops only t_extra and lets
    d/dt_c flow through the sorted merge; the fused kernel has no VJP, so
    render.py re-attaches the coarse samples with a straight-through
    scatter. Differentiate w.r.t. `far` (which flows into t_c via
    stratified_samples and into the deltas) and compare the two paths."""
    from nerf_rs_tpu.io.golden import camera_from_golden
    from nerf_rs_tpu.ops.rays import camera_rays
    from nerf_rs_tpu.render import render_rays

    cam = camera_from_golden(golden)
    origins, dirs = camera_rays(cam, 4, 4)
    origins = origins.reshape(-1, 3)
    dirs = dirs.reshape(-1, 3)
    key = jax.random.key(3)

    def loss(far, cfg):
        rgb = render_rays(lego_params["coarse"], lego_params["fine"],
                          origins, dirs, cam.near, far, key, cfg)
        return jnp.sum(rgb ** 2)

    base = RenderConfig(n_coarse=64, n_fine=128)
    g_x = jax.grad(loss)(jnp.float32(cam.far), base)
    g_p = jax.grad(loss)(jnp.float32(cam.far),
                         base.replace(sampling_impl="pallas"))
    # Values along the two paths differ at scan-order noise level, so the
    # grads agree to allclose, not bitwise.
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=2e-2, atol=1e-4)
    assert np.isfinite(np.asarray(g_p)).all() and abs(float(g_p)) > 0


def test_render_fused_sampling_composes_with_accel(lego_params, golden):
    """The two fast paths together (occupancy culling feeding the fused
    resampler's sigma input, termination culling after it): image stays
    close to the accel+XLA-sampling render."""
    from nerf_rs_tpu.accel import build_scene_grid
    from nerf_rs_tpu.io.golden import camera_from_golden
    from nerf_rs_tpu.models.mlp import nerf_mlp
    from nerf_rs_tpu.render import render_image

    grid = build_scene_grid(
        lego_params["coarse"], lego_params["fine"],
        resolution=32, aabb=(-1.8, 1.8), sigma_threshold=0.1,
        chunk=32 ** 3, mlp_fn=lambda p, x, d: nerf_mlp(p, x, d),
    )
    cam = camera_from_golden(golden)
    key = jax.random.key(13)
    base = RenderConfig(n_coarse=64, n_fine=128, ray_chunk=64)
    img_x = render_image(lego_params["coarse"], lego_params["fine"], cam,
                         8, 8, key, base, grid=grid)
    img_p = render_image(lego_params["coarse"], lego_params["fine"], cam,
                         8, 8, key, base.replace(sampling_impl="pallas"),
                         grid=grid)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=2e-3)


def test_supported_rejects_non_pow2_lane_width():
    """(64, 256) packs to 384 lanes — 128-aligned but NOT a power of two;
    the bitonic network is only a sorting network at pow2 widths, so
    supported() must reject it (it used to pass and sort incorrectly)."""
    from nerf_rs_tpu.ops.kernels.resample import supported

    assert supported(64, 128)          # canonical: 256 lanes
    assert supported(32, 64)           # wasm preset: 128 lanes
    assert not supported(64, 256)      # 384 lanes: pow2 counts, bad width
    assert not supported(128, 512)     # 768 lanes


def test_fused_resample_per_ray_far_matches_xla():
    """Per-ray far (the AABB-clamped modes cap each ray's integration
    range individually): the kernel's (R, 1) far column must match the
    XLA chain's broadcast semantics row for row."""
    cfg = RenderConfig()
    t_c, sigma, u = _inputs(96, seed=4)
    rng = np.random.default_rng(7)
    far = jnp.asarray(rng.uniform(5.0, 6.0, size=(96, 1)).astype(np.float32))
    got = fused_resample(t_c, sigma, u, far, t_threshold=cfg.t_threshold,
                         pdf_eps=cfg.pdf_eps, cdf_eps=cfg.cdf_eps)
    want = _xla_chain(t_c, sigma, u, far, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-5)
    # Scalar far still works and equals a constant column.
    got_s = fused_resample(t_c, sigma, u, 6.0, t_threshold=cfg.t_threshold,
                           pdf_eps=cfg.pdf_eps, cdf_eps=cfg.cdf_eps)
    got_c = fused_resample(t_c, sigma, u, jnp.full((96, 1), 6.0),
                           t_threshold=cfg.t_threshold,
                           pdf_eps=cfg.pdf_eps, cdf_eps=cfg.cdf_eps)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(got_c))


def test_render_fused_sampling_composes_with_aabb(lego_params, golden):
    """sampling_impl='pallas' now serves the AABB-clamped accel modes too
    (per-ray far_w): image stays close to the same config on the XLA
    sampling chain."""
    from nerf_rs_tpu.accel import build_scene_grid
    from nerf_rs_tpu.io.golden import camera_from_golden
    from nerf_rs_tpu.models.mlp import nerf_mlp
    from nerf_rs_tpu.render import render_image

    grid = build_scene_grid(
        lego_params["coarse"], lego_params["fine"],
        resolution=32, aabb=(-1.8, 1.8), sigma_threshold=0.1,
        chunk=32 ** 3, mlp_fn=lambda p, x, d: nerf_mlp(p, x, d),
    )
    cam = camera_from_golden(golden)
    key = jax.random.key(17)
    base = RenderConfig(n_coarse=64, n_fine=128, ray_chunk=64,
                        accel_sample_aabb=True, accel_aabb_probes=32)
    img_x = render_image(lego_params["coarse"], lego_params["fine"], cam,
                         8, 8, key, base, grid=grid)
    img_p = render_image(lego_params["coarse"], lego_params["fine"], cam,
                         8, 8, key, base.replace(sampling_impl="pallas"),
                         grid=grid)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=2e-3)
