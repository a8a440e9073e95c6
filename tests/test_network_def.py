"""IR tests: parsing, validation, embed/depth propagation, spaces."""

import numpy as np
import pytest

from vit_search_tpu.arch import network_def as nd
from vit_search_tpu.arch import presets, spaces


def test_parse_roundtrip():
    text = nd.format_network_def(presets.VIT_RESNAS_TINY)
    assert nd.parse_network_def(text) == presets.VIT_RESNAS_TINY


def test_parse_reference_cli_literal():
    text = ("((0, 192), (1, (192, 3, 64), (192, 768), 1), (2, 192, 1000))")
    parsed = nd.parse_network_def(text)
    assert nd.block_type(parsed[0]) == nd.LINEAR_EMBED
    assert nd.transformer_def(parsed[1]).num_heads == 3
    nd.validate(parsed)


def test_structure_queries():
    net = presets.SUPERNET_SR_TINY
    assert nd.transformer_depth(net) == 18
    assert nd.existing_depth(net) == 18
    assert nd.num_stages(net) == 3
    assert nd.stage_widths(net) == [256, 512, 1024]


def test_update_embed_size_propagates_within_stage():
    net = nd.to_mutable(presets.SUPERNET_SR_TINY)
    net[0][1] = 224          # shrink stage-1 embed
    net[8][2] = 448          # shrink stage-2 out width (SR block at index 8)
    nd.update_embed_size(net)
    out = nd.to_immutable(net)
    assert out[1][1][0] == 224 and out[1][2][0] == 224  # stage-1 blocks follow
    assert out[8][1] == 224                              # SR in follows stage 1
    assert out[9][1][0] == 448                           # stage-2 blocks follow SR out
    assert out[-1][1] == 1024                            # head keeps stage-3 width
    nd.validate(out)


def test_update_depth_cascades_consecutive_removals():
    space = spaces.get_space("sr_tiny_666")
    net = nd.to_mutable(presets.SUPERNET_SR_TINY_666)
    # stage-1 pattern is B S B S B S at indices 1..6: removable at 2, 4, 6
    net[2][3] = 0
    nd.update_depth(net, space)
    # removable 4 and 6 follow because only non-removable (reset) blocks between
    # do NOT reset: blocks 3, 5 are fixed -> reference resets on None layer space
    assert net[4][3] == 1 and net[6][3] == 1


def test_update_depth_consecutive_removable():
    # Build a space where two adjacent blocks are both removable.
    space = spaces.get_space("sr_tiny")  # stage-3 pattern has no removables; use custom
    net = nd.to_mutable(presets.VIT_TINY)
    keep = [None]
    removable = {"attn": np.array([192]), "mlp": np.array([768]),
                 "layer": np.array([192, 0])}
    fixed = {"attn": np.array([192]), "mlp": np.array([768]), "layer": None}
    keep += [fixed, removable, removable, removable] + [fixed] * 8 + [None]
    net[2][3] = 0
    nd.update_depth(net, keep)
    assert net[3][3] == 0 and net[4][3] == 0  # cascade over consecutive removables
    assert net[5][3] == 1                     # fixed block untouched


def test_spaces_align_with_largest_defs():
    pairs = [
        ("sr_tiny", presets.SUPERNET_SR_TINY),
        ("sr_tiny_666", presets.SUPERNET_SR_TINY_666),
        ("sr_tiny_mh", presets.SUPERNET_SR_TINY_MH),
        ("sr_small", presets.SUPERNET_SR_SMALL_FLEX),
        ("sr_small_mh", presets.SUPERNET_SR_SMALL_MH),
    ]
    for name, net in pairs:
        space = spaces.get_space(name)
        assert len(space) == len(net), name
        assert space[-1] is None
        for block, keep in zip(net, space):
            btype = nd.block_type(block)
            if btype == nd.TRANSFORMER:
                assert isinstance(keep, dict), name
                tdef = nd.transformer_def(block)
                # largest attn width in space == supernet attn width
                assert int(max(keep["attn"])) == tdef.attn_width, name
                assert int(max(keep["mlp"])) == tdef.ffn_hidden, name
            elif btype in nd.EMBED_TYPES:
                assert int(max(keep)) == nd.embed_channels(block), name
            elif btype == nd.SPATIAL_REDUCTION:
                assert int(max(keep)) == nd.sr_channels(block)[1], name


def test_space_lookup_errors():
    with pytest.raises(ValueError):
        spaces.get_space("nope")


def test_validate_rejects_bad_networks():
    with pytest.raises(ValueError):
        nd.validate(((0, 192), (1, (256, 4, 64), (256, 768), 1), (2, 256, 1000)))
    with pytest.raises(ValueError):
        nd.validate(((0, 192), (1, (192, 3, 64), (192, 768), 1)))  # no head
    with pytest.raises(ValueError):
        nd.validate(((2, 192, 1000), (0, 192)))  # wrong order
