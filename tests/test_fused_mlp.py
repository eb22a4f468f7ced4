"""Fused Pallas MLP kernel vs the pure-JAX oracle (interpret mode on CPU;
the same kernel compiles via Mosaic on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_rs_tpu.models.mlp import init_nerf_params, nerf_mlp
from nerf_rs_tpu.ops.kernels.fused_mlp import fused_nerf_mlp, pack_params


def _rand_inputs(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(pts), jnp.asarray(dirs)


@pytest.fixture(scope="module")
def rand_params():
    return init_nerf_params(jax.random.key(0))


def test_fused_matches_oracle_random_params(rand_params):
    pts, dirs = _rand_inputs(96)
    rgb_o, sig_o = nerf_mlp(rand_params, pts, dirs)
    rgb_k, sig_k = fused_nerf_mlp(rand_params, pts, dirs)
    np.testing.assert_allclose(rgb_k, rgb_o, atol=1e-5)
    np.testing.assert_allclose(sig_k, sig_o, atol=1e-4, rtol=1e-5)


def test_fused_matches_oracle_lego(lego_params):
    pts, dirs = _rand_inputs(64, seed=1)
    for net in ("coarse", "fine"):
        rgb_o, sig_o = nerf_mlp(lego_params[net], pts, dirs)
        rgb_k, sig_k = fused_nerf_mlp(lego_params[net], pts, dirs)
        np.testing.assert_allclose(rgb_k, rgb_o, atol=1e-5)
        np.testing.assert_allclose(sig_k, sig_o, atol=1e-3, rtol=1e-5)


def test_fused_golden(lego_params, golden):
    """The kernel itself meets the reference's 1e-2 TF-golden tolerance."""
    from nerf_rs_tpu.io.golden import golden_examples

    for ex in golden_examples(golden):
        pts = ex["ray_o"][None] + ex["ray_d"][None] * ex["z_vals"][:, None]
        dirs = np.broadcast_to(ex["viewdir_unit"], pts.shape)
        rgb, sigma = fused_nerf_mlp(lego_params["coarse"], jnp.asarray(pts), jnp.asarray(dirs))
        np.testing.assert_allclose(sigma, ex["coarse_sigma"], atol=1e-2)
        np.testing.assert_allclose(rgb, ex["coarse_rgb"], atol=1e-2)


def test_fused_batch_shapes(rand_params):
    """Arbitrary leading shapes + broadcasting viewdirs like the oracle."""
    pts, dirs = _rand_inputs(60)
    pts3 = pts.reshape(5, 12, 3)
    dirs3 = dirs.reshape(5, 12, 3)[:, :1, :]  # one dir per ray, broadcast over samples
    rgb_b, sig_b = fused_nerf_mlp(rand_params, pts3, dirs3)
    assert rgb_b.shape == (5, 12, 3) and sig_b.shape == (5, 12)
    rgb_o, sig_o = nerf_mlp(rand_params, pts3, dirs3)
    np.testing.assert_allclose(rgb_b, rgb_o, atol=1e-5)
    np.testing.assert_allclose(sig_b, sig_o, atol=1e-4, rtol=1e-5)


def test_fused_grads_match_oracle(rand_params):
    """Custom VJP (oracle-rematerialized backward) == autodiff of the oracle."""
    pts, dirs = _rand_inputs(32)

    def loss_fused(p):
        rgb, sigma = fused_nerf_mlp(p, pts, dirs)
        return jnp.mean(rgb) + 1e-3 * jnp.mean(sigma)

    def loss_oracle(p):
        rgb, sigma = nerf_mlp(p, pts, dirs)
        return jnp.mean(rgb) + 1e-3 * jnp.mean(sigma)

    g_f = jax.grad(loss_fused)(rand_params)
    g_o = jax.grad(loss_oracle)(rand_params)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_o)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4)


def test_fused_grads_match_oracle_lego(lego_params):
    """Gradient parity on the PRETRAINED weights too — their magnitudes
    (post-training scales, saturated sigmoids/ReLUs) exercise different
    numerics than He-init randomness."""
    pts, dirs = _rand_inputs(32, seed=2)

    def loss(mlp):
        def f(p):
            rgb, sigma = mlp(p, pts, dirs)
            return jnp.mean(rgb) + 1e-3 * jnp.mean(sigma)
        return f

    for net in ("coarse", "fine"):
        g_f = jax.grad(loss(fused_nerf_mlp))(lego_params[net])
        g_o = jax.grad(loss(nerf_mlp))(lego_params[net])
        for a, b in zip(jax.tree_util.tree_leaves(g_f),
                        jax.tree_util.tree_leaves(g_o)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-4)


def test_fused_grads_nondivisible_batch(rand_params):
    """Regression: batch sizes whose padded width is NOT a multiple of the
    backward tile (e.g. 640) must still produce full gradients — a
    non-dividing tile once silently truncated the grid and dropped tail
    samples from dblob/dx."""
    pts, dirs = _rand_inputs(640, seed=3)

    def loss_fused(p):
        rgb, sigma = fused_nerf_mlp(p, pts, dirs)
        return jnp.mean(rgb) + 1e-3 * jnp.mean(sigma)

    def loss_oracle(p):
        rgb, sigma = nerf_mlp(p, pts, dirs)
        return jnp.mean(rgb) + 1e-3 * jnp.mean(sigma)

    g_f = jax.grad(loss_fused)(rand_params)
    g_o = jax.grad(loss_oracle)(rand_params)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_o)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4)


def test_fused_sigma_only_matches_full(rand_params):
    """The coarse-pass variant returns the same sigma with zero rgb."""
    pts, dirs = _rand_inputs(64, seed=2)
    rgb_f, sig_f = fused_nerf_mlp(rand_params, pts, dirs)
    rgb_s, sig_s = fused_nerf_mlp(rand_params, pts, dirs, sigma_only=True)
    np.testing.assert_allclose(sig_s, sig_f, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rgb_s), 0.0)


def test_fused_sigma_only_grads_no_phantom_rgb(rand_params):
    """sigma_only's rgb output is identically zero, so a loss touching it
    must see ZERO gradient through the color branch (the shared backward
    kernel once injected phantom rgb-path gradients)."""
    pts, dirs = _rand_inputs(8, seed=4)

    def loss(mlp):
        def f(p):
            rgb, sigma = mlp(p, pts, dirs, sigma_only=True)
            return jnp.sum(rgb * 2.0) + jnp.mean(sigma)
        return f

    g_f = jax.grad(loss(fused_nerf_mlp))(rand_params)
    g_o = jax.grad(loss(nerf_mlp))(rand_params)
    for (k, a), (_, b) in zip(sorted(g_f.items()), sorted(g_o.items())):
        for part in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(a[part]), np.asarray(b[part]),
                atol=1e-6, rtol=1e-4, err_msg=f"{k}/{part}")


def test_fused_rejects_unaligned_tile(rand_params):
    pts, dirs = _rand_inputs(4)
    with pytest.raises(ValueError, match="multiple of 128"):
        fused_nerf_mlp(rand_params, pts, dirs, tile=1000)


def test_pack_params_shapes(rand_params):
    from nerf_rs_tpu.ops.kernels.fused_mlp import (
        _AUX_ROWS, _BLOB_ROWS, _encode_projection,
    )

    blob, aux = pack_params(rand_params, jnp.float32)
    assert blob.shape == (_BLOB_ROWS, 256) and aux.shape == (_AUX_ROWS, 256)
    # encoding projection sanity: G @ x reproduces freq*coord rows
    g = _encode_projection()
    x = np.zeros((8, 4), np.float32)
    x[:3, :] = np.asarray([[0.1], [-0.2], [0.3]])
    x[3:6, :] = np.asarray([[0.5], [0.6], [-0.7]])
    raw = g @ x
    np.testing.assert_allclose(raw[:3, 0], [0.1, -0.2, 0.3], atol=1e-7)
    np.testing.assert_allclose(raw[3:9, 0], [0.1, -0.2, 0.3, 0.1, -0.2, 0.3], atol=1e-7)
    np.testing.assert_allclose(raw[9:12, 0], [0.2, -0.4, 0.6], atol=1e-7)  # band 1 = 2x
    np.testing.assert_allclose(raw[64:67, 0], [0.5, 0.6, -0.7], atol=1e-7)  # dir identity
    np.testing.assert_allclose(raw[67:70, 0], [0.5, 0.6, -0.7], atol=1e-7)  # dir band 0 sin


def test_forward_interleave_matches(rand_params):
    """interleave=True (two half-tile chains per grid step) computes the
    same per-column math; only ULP-level reassociation differs (XLA CPU
    tiles a 256-wide dot differently from a 512-wide one in interpret
    mode), so match to ~1 ULP rather than bitwise."""
    from nerf_rs_tpu.ops.kernels.fused_mlp import _forward_t

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-4, 4, size=(8, 512)).astype(np.float32))
    blob, aux = pack_params(rand_params, jnp.float32)
    for sigma_only in (False, True):
        a = _forward_t(blob, aux, x, jnp.float32, 512, sigma_only, False,
                       True, interleave=False)
        b = _forward_t(blob, aux, x, jnp.float32, 512, sigma_only, False,
                       True, interleave=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_sinpoly_turns_accuracy():
    """The period-1 polynomial sine (round-5 fast-trig path): max abs
    error vs libm over many periods must stay two decades under bf16
    output rounding (~4e-3)."""
    from nerf_rs_tpu.ops.kernels.fused_mlp import _sinpoly_turns

    u = jnp.asarray(np.linspace(-500.0, 500.0, 200003, dtype=np.float64)
                    .astype(np.float32))
    got = np.asarray(_sinpoly_turns(u))
    want = np.sin(2.0 * np.pi * np.asarray(u, np.float64))
    # f32 range-reduction at |u|~500 costs ~u*eps extra on top of the
    # 1.7e-5 fit error.
    assert np.abs(got - want).max() < 5e-4


def test_trig_poly_matches_exact_bf16(rand_params, monkeypatch):
    """NERF_FUSED_TRIG=poly (the bf16 default) vs =exact: outputs agree
    at bf16 noise level, and the f32 oracle-parity path is IDENTICAL
    under either setting (poly is bf16-mode-only)."""
    pts, dirs = _rand_inputs(128, seed=3)
    monkeypatch.setenv("NERF_FUSED_TRIG", "exact")
    rgb_e, sig_e = fused_nerf_mlp(rand_params, pts, dirs, dtype="bfloat16")
    rf_e, sf_e = fused_nerf_mlp(rand_params, pts, dirs, dtype="float32")
    monkeypatch.setenv("NERF_FUSED_TRIG", "poly")
    rgb_p, sig_p = fused_nerf_mlp(rand_params, pts, dirs, dtype="bfloat16")
    rf_p, sf_p = fused_nerf_mlp(rand_params, pts, dirs, dtype="float32")
    np.testing.assert_allclose(rgb_p, rgb_e, atol=2e-2)
    np.testing.assert_allclose(sig_p, sig_e, atol=2e-2, rtol=2e-2)
    assert np.array_equal(np.asarray(rf_p), np.asarray(rf_e))
    assert np.array_equal(np.asarray(sf_p), np.asarray(sf_e))


def test_trig_poly_grads_close(rand_params, monkeypatch):
    """The ported backward (cos = sin(+0.25 turns)): grads under poly
    trig track the exact-trig grads at bf16 noise level."""
    pts, dirs = _rand_inputs(64, seed=4)

    def loss(p, trig):
        monkeypatch.setenv("NERF_FUSED_TRIG", trig)
        rgb, sig = fused_nerf_mlp(p, pts, dirs, dtype="bfloat16")
        return jnp.sum(rgb) + 1e-3 * jnp.sum(sig)

    g_e = jax.grad(lambda p: loss(p, "exact"))(rand_params)
    g_p = jax.grad(lambda p: loss(p, "poly"))(rand_params)

    def check(le, lp):
        scale = float(np.abs(le).max()) + 1e-6
        assert float(np.abs(np.asarray(le) - np.asarray(lp)).max()) < 0.12 * scale

    jax.tree_util.tree_map(check, g_e, g_p)
