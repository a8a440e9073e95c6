"""Numerics tests for ops: masking schedule, masked LN, drop path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_search_tpu.ops import (ChannelDropSchedule, drop_path,
                                expand_arch_counts, make_channel_mask,
                                masked_layer_norm)


# --- make_channel_mask -------------------------------------------------------

def test_make_channel_mask_prefix():
    counts = jnp.array([3, 0, 5])
    mask = make_channel_mask(counts, 5)
    assert mask.shape == (3, 1, 5)
    np.testing.assert_array_equal(
        np.asarray(mask[:, 0, :]),
        [[1, 1, 1, 0, 0], [0, 0, 0, 0, 0], [1, 1, 1, 1, 1]])


def test_expand_arch_counts_round_robin():
    counts = jnp.array([7, 3])
    out = expand_arch_counts(counts, 6)
    np.testing.assert_array_equal(np.asarray(out), [7, 3, 7, 3, 7, 3])
    with pytest.raises(ValueError):
        expand_arch_counts(counts, 5)


# --- ChannelDropSchedule ------------------------------------------------------

def test_warmup_formula_matches_reference():
    # reference: 1 + floor(epoch*(n-1)/warmup) clamped to [1, n]
    sched = ChannelDropSchedule([768, 640, 512, 384], num_warmup_epochs=15,
                                example_per_arch=2)
    expected = {0: 1, 1: 1, 4: 1, 5: 2, 9: 2, 10: 3, 14: 3, 15: 4, 100: 4}
    for epoch, n in expected.items():
        sched.set_epoch(epoch)
        assert sched.num_active_widths == n, epoch

    sched0 = ChannelDropSchedule([768, 384], num_warmup_epochs=0, example_per_arch=2)
    assert sched0.num_active_widths == 2


def test_schedule_sample_distribution_cycles_widths():
    sched = ChannelDropSchedule([8, 6, 4], num_warmup_epochs=0, example_per_arch=4)
    rng = np.random.default_rng(0)
    counts = sched.sample(rng, batch=24)  # 6 sub-batches over 3 widths
    assert counts.shape == (6,)
    # bank cycles each active width ceil(6/3)=2 times
    vals, freq = np.unique(counts, return_counts=True)
    np.testing.assert_array_equal(vals, [4, 6, 8])
    np.testing.assert_array_equal(freq, [2, 2, 2])


def test_schedule_single_arch():
    sched = ChannelDropSchedule([8, 6, 4], num_warmup_epochs=0, single_arch=True)
    rng = np.random.default_rng(0)
    counts = sched.sample(rng, batch=32)
    assert counts.shape == (1,)
    assert counts[0] in (4, 6, 8)


def test_schedule_warmup_epoch0_only_largest():
    sched = ChannelDropSchedule([8, 6, 4], num_warmup_epochs=5, example_per_arch=4)
    sched.set_epoch(0)
    counts = sched.sample(np.random.default_rng(0), batch=16)
    np.testing.assert_array_equal(counts, [8, 8, 8, 8])


def test_schedule_validation():
    sched = ChannelDropSchedule([8, 4], example_per_arch=5)
    with pytest.raises(ValueError):
        sched.sample(np.random.default_rng(0), batch=16)  # not divisible
    with pytest.raises(ValueError):
        ChannelDropSchedule([8, 4]).sample(np.random.default_rng(0), batch=16)


# --- masked_layer_norm ---------------------------------------------------------

def _ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return w * (x - mu) / np.sqrt(var + eps) + b


def test_masked_ln_dense_path_matches_plain_ln():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    got = masked_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), None)
    np.testing.assert_allclose(np.asarray(got), _ln(x, w, b), rtol=1e-5, atol=1e-5)


def test_masked_ln_equals_sliced_ln():
    """The invariant behind supernet==subnet: masked LN over C with k kept
    channels equals dense LN computed on the first k channels."""
    rng = np.random.default_rng(1)
    C, k = 16, 10
    x = rng.normal(size=(3, 4, C)).astype(np.float32)
    x[..., k:] = 0.0
    w = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    mask = np.zeros((3, 1, C), np.float32)
    mask[..., :k] = 1.0

    got = masked_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            jnp.asarray(mask))
    expected = _ln(x[..., :k], w[:k], b[:k])
    np.testing.assert_allclose(np.asarray(got)[..., :k], expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got)[..., k:], 0.0)


def test_masked_ln_gradient_equals_sliced_ln_gradient():
    """Gradients w.r.t. kept channels match dense LN on the slice; the
    reference hand-written backward is the analytic gradient of the forward."""
    rng = np.random.default_rng(2)
    C, k = 12, 8
    x = rng.normal(size=(2, 3, C)).astype(np.float32)
    x[..., k:] = 0.0
    w = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    mask = np.zeros((2, 1, C), np.float32)
    mask[..., :k] = 1.0
    g = rng.normal(size=(2, 3, C)).astype(np.float32)

    def f_masked(x_, w_, b_):
        y = masked_layer_norm(x_, w_, b_, jnp.asarray(mask))
        return jnp.sum(y * jnp.asarray(g))

    def f_sliced(x_, w_, b_):
        y = masked_layer_norm(x_, w_, b_, None)
        return jnp.sum(y * jnp.asarray(g[..., :k]))

    gx, gw, gb = jax.grad(f_masked, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    sgx, sgw, sgb = jax.grad(f_sliced, argnums=(0, 1, 2))(
        jnp.asarray(x[..., :k]), jnp.asarray(w[:k]), jnp.asarray(b[:k]))

    np.testing.assert_allclose(np.asarray(gw)[:k], np.asarray(sgw), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb)[:k], np.asarray(sgb), rtol=2e-3, atol=1e-4)
    # grads w.r.t. masked-out weight/bias are zero (y*mask kills them)
    np.testing.assert_array_equal(np.asarray(gw)[k:], 0.0)
    np.testing.assert_array_equal(np.asarray(gb)[k:], 0.0)
    # x-grad on kept channels: slice equivalence needs the mu/var coupling to
    # the zero channels; check against the dense-slice gradient
    np.testing.assert_allclose(np.asarray(gx)[..., :k], np.asarray(sgx),
                               rtol=2e-3, atol=1e-4)


def test_masked_ln_bf16_inputs_use_f32_stats():
    rng = np.random.default_rng(3)
    x = (rng.normal(size=(2, 4, 8)) * 100).astype(np.float32)
    w = np.ones((8,), np.float32)
    b = np.zeros((8,), np.float32)
    got16 = masked_layer_norm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w),
                              jnp.asarray(b), None)
    assert got16.dtype == jnp.bfloat16
    got32 = masked_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), None)
    np.testing.assert_allclose(np.asarray(got16, dtype=np.float32),
                               np.asarray(got32), atol=0.05)


# --- drop_path -------------------------------------------------------------------

def test_drop_path_deterministic_passthrough():
    x = jnp.ones((4, 3, 2))
    out = drop_path(x, 0.5, jax.random.PRNGKey(0), deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_drop_path_scales_survivors():
    x = jnp.ones((512, 2))
    out = np.asarray(drop_path(x, 0.25, jax.random.PRNGKey(0), deterministic=False))
    per_sample = out[:, 0]
    assert set(np.unique(per_sample.round(4))) <= {0.0, np.float32(1 / 0.75).round(4)}
    # unbiased in expectation
    assert abs(out.mean() - 1.0) < 0.1
