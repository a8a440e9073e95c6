"""Differential tests against the reference PyTorch implementation.

These run only where the reference checkout is mounted (CI for this rebuild);
they validate bit-level semantics that golden values can't: the masked
layer-norm forward/backward, the supernet block's mask algebra, and the
ChannelDrop mask-bank schedule, executed side by side with the actual
upstream torch modules (CPU).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REFERENCE, "nets")),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def refnets():
    """Load reference nets/* as a package without its timm-importing __init__,
    with the hard-coded .cuda() calls neutralized for CPU execution."""
    pkg = types.ModuleType("refnets")
    pkg.__path__ = [os.path.join(REFERENCE, "nets")]
    sys.modules["refnets"] = pkg

    # the reference is GPU-only by construction (SURVEY 2.9); route to CPU
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self

    mods = {}
    for name in ("masked_layer_norm", "channel_drop", "drop", "supernet_blocks"):
        mods[name] = importlib.import_module(f"refnets.{name}")
    return mods


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


# --- masked layer norm ---------------------------------------------------------


def test_masked_ln_forward_backward_parity(refnets):
    import jax
    import jax.numpy as jnp

    from vit_search_tpu.ops import masked_layer_norm

    rng = np.random.default_rng(0)
    B, N, C, k = 3, 5, 16, 11
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    x[..., k:] = 0.0
    w = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    mask = np.zeros((B, 1, C), np.float32)
    mask[..., :k] = 1.0
    g = rng.normal(size=(B, N, C)).astype(np.float32)

    # reference: custom autograd function + re-mask (module forward)
    ref_mod = refnets["masked_layer_norm"].MaskedLayerNorm(C)
    with torch.no_grad():
        ref_mod.weight.copy_(_t(w))
        ref_mod.bias.copy_(_t(b))
    xt = _t(x).requires_grad_(True)
    yt = ref_mod(xt, _t(mask).bool())
    yt.backward(_t(g))

    # ours
    def f(x_, w_, b_):
        return jnp.sum(masked_layer_norm(x_, w_, b_, jnp.asarray(mask))
                       * jnp.asarray(g))

    y = masked_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                          jnp.asarray(mask))
    gx, gw, gb = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))

    np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), ref_mod.weight.grad.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), ref_mod.bias.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


# --- ChannelDrop schedule ---------------------------------------------------------


def test_channel_drop_bank_parity(refnets):
    from vit_search_tpu.ops import ChannelDropSchedule

    widths = [32, 24, 16, 8]
    B, epa = 16, 4
    for epoch in (0, 3, 7, 14, 15, 40):
        ref = refnets["channel_drop"].ChannelDrop(
            num_channels_to_keep=np.array(widths), num_warmup_epochs=15,
            example_per_arch=epa)
        ref.set_epoch(epoch)
        ref.set_mask(torch.zeros((B, 1, 32)))
        ref_bank = sorted(int(m.sum()) for m in ref.mask)

        mine = ChannelDropSchedule(widths, num_warmup_epochs=15,
                                   example_per_arch=epa)
        mine.set_epoch(epoch)
        assert mine.num_active_widths == ref.num_layer_config, epoch
        my_bank = sorted(int(v) for v in mine._bank(B // epa))
        assert my_bank == ref_bank, (epoch, my_bank, ref_bank)


# --- supernet block --------------------------------------------------------------


def test_block_forward_parity(refnets):
    """Reference Block (torch) vs our Block (flax) with synced weights and
    identical fixed masks: the full mask algebra, masked LN, attention and
    MLP agree."""
    import jax
    import jax.numpy as jnp

    from vit_search_tpu.models.layers import Block

    B, N, C, H, D, M = 4, 5, 16, 2, 8, 32
    k_embed, k_attn, k_mlp = 12, 8, 20

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    embed_mask = np.zeros((B, 1, C), np.float32)
    embed_mask[..., :k_embed] = 1.0
    x = x * embed_mask

    ref_block = refnets["supernet_blocks"].Block(
        dim=C, num_heads=H, head_dim=D, mlp_features=M,
        num_chs_to_keep_attn=np.array([H * D, k_attn]),
        num_chs_to_keep_mlp=np.array([M, k_mlp]),
        num_chs_to_keep_block=np.array([C, 0]),
        example_per_arch=2)
    ref_block.eval()

    def fixed(drop_layer, keep, width):
        m = torch.zeros((1, 1, width), dtype=torch.bool)
        m[..., :keep] = True
        drop_layer.set_fixed_mask(m)

    fixed(ref_block.attn.channel_drop_layer, k_attn, H * D)
    fixed(ref_block.mlp.channel_drop_layer, k_mlp, M)
    fixed(ref_block.layer_drop, C, C)  # layer kept

    with torch.no_grad():
        out_t, _, _ = ref_block(_t(x), _t(embed_mask).bool(), None)

    # ours, weights copied from torch (flax kernels are torch weights^T)
    model = Block(dim=C, num_heads=H, head_dim=D, mlp_hidden=M)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {k: v.detach().numpy() for k, v in ref_block.state_dict().items()}
    params = {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "attn": {
            "qkv": {"kernel": sd["attn.qkv.weight"].T, "bias": sd["attn.qkv.bias"]},
            "proj": {"kernel": sd["attn.proj.weight"].T, "bias": sd["attn.proj.bias"]},
        },
        "mlp": {
            "fc1": {"kernel": sd["mlp.fc1.weight"].T, "bias": sd["mlp.fc1.bias"]},
            "fc2": {"kernel": sd["mlp.fc2.weight"].T, "bias": sd["mlp.fc2.bias"]},
        },
    }
    params = jax.tree.map(jnp.asarray, params)

    def mask_arr(keep, width):
        m = np.zeros((B, 1, width), bool)
        m[..., :keep] = True
        return jnp.asarray(m)

    masks = {"attn": mask_arr(k_attn, H * D), "mlp": mask_arr(k_mlp, M),
             "layer": mask_arr(C, C)}
    out, _ = model.apply({"params": params}, jnp.asarray(x),
                         jnp.asarray(embed_mask).astype(bool), None, masks)
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_block_parity_with_dropped_layer(refnets):
    """A layer-dropped block must reduce to the identity on both sides."""
    import jax
    import jax.numpy as jnp

    from vit_search_tpu.models.layers import Block

    B, N, C, H, D, M = 2, 3, 16, 2, 8, 32
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    embed_mask = np.ones((B, 1, C), np.float32)

    ref_block = refnets["supernet_blocks"].Block(
        dim=C, num_heads=H, head_dim=D, mlp_features=M,
        num_chs_to_keep_attn=np.array([H * D]),
        num_chs_to_keep_mlp=np.array([M]),
        num_chs_to_keep_block=np.array([C, 0]),
        example_per_arch=1)
    ref_block.eval()
    zero = torch.zeros((1, 1, C), dtype=torch.bool)
    ref_block.layer_drop.set_fixed_mask(zero)
    full = torch.ones((1, 1, H * D), dtype=torch.bool)
    ref_block.attn.channel_drop_layer.set_fixed_mask(full)
    ref_block.mlp.channel_drop_layer.set_fixed_mask(
        torch.ones((1, 1, M), dtype=torch.bool))
    with torch.no_grad():
        out_t, _, _ = ref_block(_t(x), _t(embed_mask).bool(), None)
    np.testing.assert_allclose(out_t.numpy(), x, atol=1e-6)  # identity

    model = Block(dim=C, num_heads=H, head_dim=D, mlp_hidden=M)
    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(x))
    masks = {"attn": jnp.ones((B, 1, H * D), bool),
             "mlp": jnp.ones((B, 1, M), bool),
             "layer": jnp.zeros((B, 1, C), bool)}
    out, _ = model.apply(variables, jnp.asarray(x),
                         jnp.asarray(embed_mask).astype(bool), None, masks)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_training_dynamics_parity_short():
    """End-to-end differential training vs the executed reference model:
    same net, same initial weights, same batches, same recipe -> same
    per-step losses (tools/parity_study.py; full study in
    RESULTS_parity.md).  Short run: 6 steps must agree to 1e-4."""
    import sys

    from vit_search_tpu.tools import parity_study

    argv = sys.argv
    sys.argv = ["parity_study", "--steps-per-epoch", "3", "--epochs", "2",
                "--batch-size", "16", "--eval-size", "64"]
    try:
        result = parity_study.main()
    finally:
        sys.argv = argv
    assert result["max_abs_loss_diff"] < 1e-4
    assert result["final_acc_gap"] <= 5.0  # 64-image eval granularity
