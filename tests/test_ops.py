"""Unit tests for encoding / sampling / volume ops.

Each vectorized op is checked against a straightforward scalar-loop numpy
model of the reference semantics (the loops in network.rs:263-330 and
lib.rs:233-351) — written here from the spec, not ported.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_rs_tpu.models.encoding import encoded_dim, positional_encoding
from nerf_rs_tpu.ops.sampling import importance_samples, merge_samples, stratified_samples
from nerf_rs_tpu.ops.volume import compute_weights, composite, sample_deltas

RNG = np.random.default_rng(0)


# ---------- scalar-loop models of the reference semantics ----------

def loop_encoding(p, n):
    out = [p[0], p[1], p[2]]
    f = 1.0
    for _ in range(n):
        for a in range(3):
            out.append(np.sin(f * p[a]))
        for a in range(3):
            out.append(np.cos(f * p[a]))
        f *= 2.0
    return np.asarray(out, dtype=np.float32)


def loop_weights(sigmas, t, far, threshold=1e-4):
    n = len(t)
    weights = []
    trans = 1.0
    for i in range(n):
        delta = (t[i + 1] - t[i]) if i + 1 < n else (far - t[i])
        delta = max(delta, 0.0)
        alpha = 1.0 - np.exp(-sigmas[i] * delta)
        weights.append(trans * alpha)
        trans *= 1.0 - alpha
        if trans < threshold:
            weights.extend([0.0] * (n - i - 1))
            break
    return np.asarray(weights, dtype=np.float64)


def loop_importance_bin(u, cdf):
    idx = len(cdf) - 2
    for j in range(len(cdf) - 1):
        if cdf[j] <= u < cdf[j + 1]:
            return j
    return idx


# ---------- encoding ----------

def test_encoding_matches_loop():
    pts = RNG.normal(size=(17, 3)).astype(np.float32)
    enc = np.asarray(positional_encoding(jnp.asarray(pts), 10))
    assert enc.shape == (17, encoded_dim(10))
    for i in range(17):
        np.testing.assert_allclose(enc[i], loop_encoding(pts[i], 10), atol=1e-6)


def test_encoding_dirs_dim():
    dirs = RNG.normal(size=(5, 3)).astype(np.float32)
    assert positional_encoding(jnp.asarray(dirs), 4).shape == (5, 27)


# ---------- volume weights ----------

def test_deltas():
    t = np.array([[2.0, 3.0, 3.5, 5.9]], dtype=np.float32)
    d = np.asarray(sample_deltas(jnp.asarray(t), 6.0))
    np.testing.assert_allclose(d, [[1.0, 0.5, 2.4, 0.1]], atol=1e-6)


def test_delta_clamp_nonnegative():
    # final delta clamps when t exceeds far (lib.rs:267-269)
    t = np.array([[2.0, 6.5]], dtype=np.float32)
    d = np.asarray(sample_deltas(jnp.asarray(t), 6.0))
    np.testing.assert_allclose(d, [[4.5, 0.0]], atol=1e-6)


@pytest.mark.parametrize("scale", [0.1, 5.0, 100.0])
def test_weights_match_loop(scale):
    far = 6.0
    t = np.sort(RNG.uniform(2.0, far, size=(8, 32)), axis=-1).astype(np.float32)
    sig = (RNG.gamma(1.0, scale, size=(8, 32))).astype(np.float32)
    w = np.asarray(compute_weights(jnp.asarray(sig), jnp.asarray(t), far))
    for i in range(8):
        np.testing.assert_allclose(w[i], loop_weights(sig[i], t[i], far), atol=1e-5)


def test_weights_early_out_zeroes_tail():
    # huge sigma saturates immediately -> all later weights exactly zero
    t = np.linspace(2.0, 6.0, 16, dtype=np.float32)[None]
    sig = np.full((1, 16), 1e4, dtype=np.float32)
    w = np.asarray(compute_weights(jnp.asarray(sig), jnp.asarray(t), 6.0))
    assert w[0, 0] > 0.99
    np.testing.assert_array_equal(w[0, 2:], 0.0)


def test_weights_no_threshold_sums_to_alpha_complement():
    t = np.sort(RNG.uniform(2.0, 6.0, size=(4, 64)), axis=-1).astype(np.float32)
    sig = RNG.gamma(1.0, 2.0, size=(4, 64)).astype(np.float32)
    w = np.asarray(compute_weights(jnp.asarray(sig), jnp.asarray(t), 6.0, t_threshold=0.0))
    deltas = np.asarray(sample_deltas(jnp.asarray(t), 6.0))
    total_trans = np.exp(-np.sum(sig * deltas, axis=-1))
    np.testing.assert_allclose(np.sum(w, axis=-1), 1.0 - total_trans, atol=1e-4)


def test_composite_white_background():
    colors = np.zeros((1, 4, 3), dtype=np.float32)
    weights = np.zeros((1, 4), dtype=np.float32)
    out = np.asarray(composite(jnp.asarray(colors), jnp.asarray(weights)))
    np.testing.assert_allclose(out, [[1.0, 1.0, 1.0]])  # empty ray -> white bg


# ---------- stratified sampling ----------

def test_stratified_in_bins():
    key = jax.random.key(0)
    t = np.asarray(stratified_samples(key, 2.0, 6.0, 64, (100,)))
    assert t.shape == (100, 64)
    interval = 4.0 / 64
    lower = 2.0 + np.arange(64) * interval
    assert np.all(t >= lower - 1e-6) and np.all(t < lower + interval + 1e-6)
    # strictly sorted per ray (bins are disjoint)
    assert np.all(np.diff(t, axis=-1) > 0)


# ---------- importance sampling ----------

def test_importance_matches_loop_semantics():
    """Vectorized inverse-CDF == scalar linear-scan model, same u draws."""
    nc, nf = 16, 32
    t = np.sort(RNG.uniform(2.0, 6.0, size=(nc,))).astype(np.float32)
    w = RNG.uniform(0.0, 1.0, size=(nc,)).astype(np.float32)

    key = jax.random.key(7)
    got = np.asarray(importance_samples(key, jnp.asarray(t[None]), jnp.asarray(w[None]), nf))[0]

    # reproduce the exact uniforms our op drew
    u = np.asarray(jax.random.uniform(key, (1, nf)))[0]

    bins = 0.5 * (t[1:] + t[:-1])
    adj = np.maximum(w[1:-1], 0.0) + 1e-5
    pdf = adj / adj.sum()
    cdf = np.concatenate([[0.0], np.cumsum(pdf)])
    cdf[-1] = 1.0
    expected = []
    for ui in u:
        j = loop_importance_bin(ui, cdf)
        denom = max(cdf[j + 1] - cdf[j], 1e-6)
        frac = (ui - cdf[j]) / denom
        expected.append(bins[j] + (bins[j + 1] - bins[j]) * frac)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_importance_samples_within_range():
    key = jax.random.key(3)
    t = np.asarray(stratified_samples(key, 2.0, 6.0, 64, (10,)))
    w = RNG.uniform(size=(10, 64)).astype(np.float32)
    s = np.asarray(importance_samples(jax.random.key(4), jnp.asarray(t), jnp.asarray(w), 128))
    bins_lo = 0.5 * (t[:, 0] + t[:, 1])
    bins_hi = 0.5 * (t[:, -2] + t[:, -1])
    assert np.all(s >= bins_lo[:, None] - 1e-5)
    assert np.all(s <= bins_hi[:, None] + 1e-5)


def test_importance_concentrates_mass():
    """Samples should land where the weights are."""
    t = np.linspace(2.0, 6.0, 64, dtype=np.float32)[None]
    w = np.zeros((1, 64), dtype=np.float32)
    w[0, 30:34] = 10.0  # a spike near t ~= 3.9-4.1
    s = np.asarray(importance_samples(jax.random.key(0), jnp.asarray(t), jnp.asarray(w), 256))
    frac_near_spike = np.mean((s > 3.7) & (s < 4.3))
    assert frac_near_spike > 0.95


def test_merge_sorted():
    a = np.array([[3.0, 1.0, 2.0]], dtype=np.float32)
    b = np.array([[2.5, 0.5]], dtype=np.float32)
    m = np.asarray(merge_samples(jnp.asarray(np.sort(a)), jnp.asarray(b)))
    np.testing.assert_allclose(m, [[0.5, 1.0, 2.0, 2.5, 3.0]])
