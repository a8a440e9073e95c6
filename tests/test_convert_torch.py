"""Torch-checkpoint converter tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vit_search_tpu.models import VisionTransformerSR
from vit_search_tpu.tools.convert_torch import convert_state_dict

NET = ((4, 16),
       (1, (16, 2, 8), (16, 32), 1),
       (1, (16, 2, 8), (16, 32), 0),
       (3, 16, 32),
       (1, (32, 2, 16), (32, 64), 1),
       (2, 32, 4))
LINEAR_NET = ((0, 16),) + NET[1:]
IMG, PATCH = 28, 7


def _tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def _synth_torch_sd(params, batch_stats, network_def, patch=PATCH):
    """Inverse of convert_state_dict: flax trees -> reference-keyed arrays."""
    from vit_search_tpu.arch import network_def as nd

    sd = {}

    def put_linear(name, leaf):
        sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(leaf["kernel"]).T)
        if "bias" in leaf:
            sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    def put_norm(name, leaf):
        sd[f"{name}.weight"] = np.asarray(leaf["scale"])
        sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    def put_conv(name, leaf):
        sd[f"{name}.weight"] = np.ascontiguousarray(
            np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1))
        if "bias" in leaf:
            sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    stem_type = nd.block_type(network_def[0])
    if stem_type == nd.LINEAR_EMBED:
        kernel = np.asarray(params["patch_embed"]["proj"]["kernel"])
        o = kernel.shape[1]
        w = kernel.reshape(patch, patch, 3, o).transpose(3, 2, 0, 1)
        sd["patch_embed.proj.weight"] = np.ascontiguousarray(w)
        sd["patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["proj"]["bias"])
    else:
        put_conv("patch_embed.conv_proj", params["patch_embed"]["proj"])
        for c in ("conv1", "conv2", "conv3"):
            put_conv(f"patch_embed.{c}.conv", params["patch_embed"][c]["conv"])
            put_norm(f"patch_embed.{c}.bn", params["patch_embed"][c]["bn"])
            sd[f"patch_embed.{c}.bn.running_mean"] = np.asarray(
                batch_stats["patch_embed"][c]["bn"]["mean"])
            sd[f"patch_embed.{c}.bn.running_var"] = np.asarray(
                batch_stats["patch_embed"][c]["bn"]["var"])

    sd["tokens"] = np.asarray(params["tokens"])
    sd["pos_embed"] = np.asarray(params["pos_embed"])
    put_norm("norm", params["norm"])
    for head in ("cls_head", "dst_head", "patch_head"):
        if head in params:
            put_linear(head, params[head])

    j = 0
    for slot, block in enumerate(network_def):
        btype = nd.block_type(block)
        if btype == nd.TRANSFORMER:
            if block[3]:
                blk = params[f"blocks_{slot}"]
                put_norm(f"blocks.{j}.norm1", blk["norm1"])
                put_norm(f"blocks.{j}.norm2", blk["norm2"])
                put_linear(f"blocks.{j}.attn.qkv", blk["attn"]["qkv"])
                put_linear(f"blocks.{j}.attn.proj", blk["attn"]["proj"])
                put_linear(f"blocks.{j}.mlp.fc1", blk["mlp"]["fc1"])
                put_linear(f"blocks.{j}.mlp.fc2", blk["mlp"]["fc2"])
            j += 1
        elif btype == nd.SPATIAL_REDUCTION:
            blk = params[f"blocks_{slot}"]
            put_norm(f"blocks.{j}.norm", blk["norm"])
            put_conv(f"blocks.{j}.patch_reduce", blk["reduce"])
            put_linear(f"blocks.{j}.token_transform", blk["token_transform"])
            sd[f"blocks.{j}.pos_embed"] = np.asarray(blk["pos_embed"])
            j += 1
    return sd


@pytest.mark.parametrize("net", [NET, LINEAR_NET], ids=["conv_stem", "linear_stem"])
def test_convert_roundtrip_structure_and_values(net):
    # the conv stem requires an even patch size (reference constraint)
    patch = 14 if net[0][0] == 4 else PATCH
    model = VisionTransformerSR(network_def=net, img_size=IMG, patch_size=patch,
                                num_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    sd = _synth_torch_sd(params, batch_stats, net)
    got_params, got_stats = convert_state_dict(sd, net)

    assert _tree_shapes(got_params) == _tree_shapes(params)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(got_params)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))
    if batch_stats:
        assert _tree_shapes(got_stats) == _tree_shapes(batch_stats)

    # converted params run
    out = model.apply({"params": got_params, "batch_stats": got_stats}
                      if batch_stats else {"params": got_params},
                      jnp.ones((1, IMG, IMG, 3)))
    assert np.isfinite(np.asarray(out)).all()


def test_linear_stem_matches_torch_conv():
    """PatchEmbed's reshape-matmul == the reference conv patchify, through
    the converter's weight mapping."""
    from vit_search_tpu.models.patch_embed import PatchEmbed

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    w = rng.normal(size=(16, 3, PATCH, PATCH)).astype(np.float32)  # torch conv
    b = rng.normal(size=(16,)).astype(np.float32)

    conv = torch.nn.Conv2d(3, 16, kernel_size=PATCH, stride=PATCH)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w))
        conv.bias.copy_(torch.tensor(b))
        ref = conv(torch.tensor(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().reshape(2, 16, -1).transpose(0, 2, 1)  # (B, N, C)

    sd = {"patch_embed.proj.weight": w, "patch_embed.proj.bias": b}
    params, _ = convert_state_dict(sd, ((0, 16), (2, 16, 4)))
    pe = PatchEmbed(IMG, PATCH, 16)
    got = pe.apply({"params": params["patch_embed"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)
