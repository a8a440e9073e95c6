"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_search_tpu.ops import masked_layer_norm
from vit_search_tpu.ops.pallas import (masked_layer_norm_pallas,
                                       masked_ln_supported)


def _data(B=2, N=16, C=128, k=96, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, N, C)).astype(dtype)
    x[..., k:] = 0
    w = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    mask = np.zeros((B, 1, C), np.float32)
    mask[..., :k] = 1
    return map(jnp.asarray, (x, w, b, mask))


def test_pallas_masked_ln_forward_matches_reference_path():
    x, w, b, mask = _data()
    got = masked_layer_norm_pallas(x, w, b, mask)
    want = masked_layer_norm(x, w, b, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_masked_ln_gradients_match():
    x, w, b, mask = _data(seed=1)
    g = jnp.asarray(np.random.default_rng(2).normal(size=x.shape)
                    .astype(np.float32))

    def loss(fn):
        return lambda x_, w_, b_: jnp.sum(fn(x_, w_, b_, mask) * g)

    got = jax.grad(loss(masked_layer_norm_pallas), argnums=(0, 1, 2))(x, w, b)
    want = jax.grad(loss(masked_layer_norm), argnums=(0, 1, 2))(x, w, b)
    for a, e, name in zip(got, want, ("gx", "gw", "gb")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_masked_ln_bf16():
    x, w, b, mask = _data()
    got = masked_layer_norm_pallas(x.astype(jnp.bfloat16), w, b, mask)
    assert got.dtype == jnp.bfloat16
    want = masked_layer_norm(x, w, b, mask)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), atol=0.1)


def test_pallas_supported_predicate():
    x, _, _, mask = _data()
    assert masked_ln_supported(x, mask)
    assert not masked_ln_supported(x, None)
    assert not masked_ln_supported(jnp.zeros((2, 16, 100)), mask)  # C % 128 != 0
    assert masked_ln_supported(jnp.zeros((2, 7, 128)), mask)       # odd N is fine


def test_pallas_masked_ln_odd_seq_lengths():
    """ViT-SR stage lengths (257/65/17) are odd; whole-sequence blocks must
    reduce correctly, forward and backward."""
    for n in (7, 17, 65):
        x, w, b, mask = _data(N=n, seed=n)
        got = masked_layer_norm_pallas(x, w, b, mask)
        want = masked_layer_norm(x, w, b, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=str(n))
        g = jnp.asarray(np.random.default_rng(n).normal(size=x.shape)
                        .astype(np.float32))

        def loss(fn):
            return lambda x_, w_, b_: jnp.sum(fn(x_, w_, b_, mask) * g)

        ga = jax.grad(loss(masked_layer_norm_pallas), argnums=(0, 1, 2))(x, w, b)
        ge = jax.grad(loss(masked_layer_norm), argnums=(0, 1, 2))(x, w, b)
        for a, e, name in zip(ga, ge, ("gx", "gw", "gb")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"N={n} {name}")


def test_pallas_multi_tile_rows():
    # N larger than one row tile exercises the grid's second dimension
    x, w, b, mask = _data(N=256)
    got = masked_layer_norm_pallas(x, w, b, mask)
    want = masked_layer_norm(x, w, b, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# --- fused attention --------------------------------------------------------


def _attn_ref(q, k, v, scale):
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def _qkv(B=2, N=17, H=2, D=16, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, N, H, D)).astype(dtype))
    return mk(), mk(), mk()


def test_fused_attention_forward_matches_reference():
    from vit_search_tpu.ops.pallas.attention import fused_attention
    q, k, v = _qkv()
    scale = 16 ** -0.5
    got = fused_attention(q, k, v, scale)
    want = _attn_ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_attention_gradients_match():
    from vit_search_tpu.ops.pallas.attention import fused_attention
    q, k, v = _qkv(seed=1)
    scale = 16 ** -0.5
    g = jnp.asarray(np.random.default_rng(2).normal(size=q.shape)
                    .astype(np.float32))

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_, scale) * g)

    got = jax.grad(loss(fused_attention), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss(_attn_ref), argnums=(0, 1, 2))(q, k, v)
    for a, e, name in zip(got, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_fused_attention_bf16():
    from vit_search_tpu.ops.pallas.attention import fused_attention
    q, k, v = _qkv(dtype=np.float32, seed=3)
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = fused_attention(q16, k16, v16, 0.25)
    assert got.dtype == jnp.bfloat16
    want = _attn_ref(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), atol=0.05)


def test_fused_attention_odd_seq_lengths():
    """Non-tile-aligned N (257-style) must reduce correctly."""
    from vit_search_tpu.ops.pallas.attention import fused_attention
    for n in (9, 17, 65):
        q, k, v = _qkv(N=n, seed=n)
        got = fused_attention(q, k, v, 0.25)
        want = _attn_ref(q, k, v, 0.25)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5, err_msg=str(n))


def test_fused_attention_qkv_matches_packed_and_reference():
    """The packed-projection entry (one (B,N,3W) input, in-kernel q/k/v
    slicing) matches the reference einsum in forward and gradients."""
    from vit_search_tpu.ops.pallas.attention import fused_attention_qkv

    B, N, H, D = 2, 17, 2, 16
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    scale = D ** -0.5
    W = H * D
    qkv = jnp.concatenate([q.reshape(B, N, W), k.reshape(B, N, W),
                           v.reshape(B, N, W)], axis=-1)

    got = fused_attention_qkv(qkv, scale, H)
    want = _attn_ref(q, k, v, scale).reshape(B, N, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    def loss_fused(x):
        return (fused_attention_qkv(x, scale, H) ** 2).sum()

    def loss_ref(x):
        qq = x[:, :, :W].reshape(B, N, H, D)
        kk = x[:, :, W:2 * W].reshape(B, N, H, D)
        vv = x[:, :, 2 * W:].reshape(B, N, H, D)
        return (_attn_ref(qq, kk, vv, scale) ** 2).sum()

    g_got = jax.grad(loss_fused)(qkv)
    g_want = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-3, atol=1e-4)


def test_fused_attention_qkv_bf16():
    from vit_search_tpu.ops.pallas.attention import fused_attention_qkv

    B, N, H, D = 2, 16, 2, 16
    q, k, v = _qkv(B=B, N=N, H=H, D=D)
    W = H * D
    qkv = jnp.concatenate([q.reshape(B, N, W), k.reshape(B, N, W),
                           v.reshape(B, N, W)], axis=-1).astype(jnp.bfloat16)
    got = fused_attention_qkv(qkv, 0.25, H)
    assert got.dtype == jnp.bfloat16
    want = _attn_ref(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), 0.25).reshape(B, N, W)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_fused_attention_qkv_t_matches_batch_major():
    """The sequence-major variant (VST_PALLAS_ATTN_T experiment) must be
    numerically identical to the batch-major kernel, fwd and bwd."""
    from vit_search_tpu.ops.pallas.attention import (fused_attention_qkv,
                                                     fused_attention_qkv_t)

    B, N, H, D = 4, 18, 3, 16
    W = H * D
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * W)).astype(np.float32))
    scale = D ** -0.5

    want = fused_attention_qkv(qkv, scale, H)
    got = jnp.transpose(
        fused_attention_qkv_t(jnp.transpose(qkv, (1, 0, 2)), scale, H),
        (1, 0, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_bm(x):
        return (fused_attention_qkv(x, scale, H) ** 2).sum()

    def loss_sm(x):
        y = fused_attention_qkv_t(jnp.transpose(x, (1, 0, 2)), scale, H)
        return (jnp.transpose(y, (1, 0, 2)) ** 2).sum()

    g_want = jax.grad(loss_bm)(qkv)
    g_got = jax.grad(loss_sm)(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-5)
