"""Model-layer tests.

The centerpiece is the supernet==subnet equivalence property: a masked
supernet forward with keep counts describing candidate X must equal the
dense forward of X built from prefix-sliced supernet parameters.  This is
the contract the whole NAS pipeline rests on (reference: nets/net_utils.py
extraction + ChannelDrop prefix masks + rewiring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_search_tpu.models import (SupernetSchedules, VisionTransformerSR,
                                   build_arch_masks, create_model,
                                   available_models, rewire_params,
                                   slice_subnet_params, interpolate_pos_embeds)

# A tiny 2-stage supernet and a strictly smaller candidate in its space.
SUPER = ((0, 16),
         (1, (16, 4, 4), (16, 32), 1),
         (1, (16, 4, 4), (16, 32), 1),
         (3, 16, 32),
         (1, (32, 4, 8), (32, 64), 1),
         (2, 32, 10))

SUB = ((0, 12),
       (1, (12, 2, 4), (12, 16), 1),
       (1, (12, 2, 4), (12, 16), 0),   # removed block
       (3, 12, 24),
       (1, (24, 2, 8), (24, 32), 1),
       (2, 24, 10))

SPACE = [np.array([16, 12, 8]),
         {"attn": np.array([16, 8]), "mlp": np.array([32, 16]), "layer": None},
         {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
          "layer": np.array([16, 0])},
         np.array([32, 24]),
         {"attn": np.array([32, 16]), "mlp": np.array([64, 32]), "layer": None},
         None]

IMG = 28
PATCH = 7


def _model(net, **kw):
    return VisionTransformerSR(network_def=net, img_size=IMG, patch_size=PATCH,
                               num_classes=10, **kw)


def _init(model, rng=0, batch=4):
    x = jnp.zeros((batch, IMG, IMG, 3))
    return model.init(jax.random.PRNGKey(rng), x)


def test_forward_shapes_all_heads():
    x = jnp.ones((2, IMG, IMG, 3))
    plain = _model(SUPER)
    out = plain.apply(_init(plain, batch=2), x)
    assert out.shape == (2, 10)

    distill = _model(SUPER, distill_token=True)
    cls, dst = distill.apply(_init(distill, batch=2), x)
    assert cls.shape == dst.shape == (2, 10)

    po = _model(SUPER, patch_output=True)
    v = _init(po, batch=2)
    cls, patch = po.apply(v, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    n_final_patches = (IMG // PATCH // 2) ** 2
    assert cls.shape == (2, 10) and patch.shape == (2, n_final_patches, 10)
    cls_avg, patch_avg = po.apply(v, x, deterministic=False, patch_output_type="avg",
                                  rngs={"dropout": jax.random.PRNGKey(1)})
    assert patch_avg.shape == (2, 10)
    assert po.apply(v, x).shape == (2, 10)  # eval: cls only


def test_supernet_equals_sliced_subnet():
    batch = 4
    x = jax.random.normal(jax.random.PRNGKey(7), (batch, IMG, IMG, 3))

    supernet = _model(SUPER)
    super_vars = _init(supernet, rng=3, batch=batch)

    subnet = _model(SUB)
    sub_vars = _init(subnet, rng=4, batch=batch)
    sliced = slice_subnet_params(super_vars["params"], sub_vars["params"])

    sched = SupernetSchedules(SUPER, SPACE, example_per_arch=batch,
                              num_warmup_epochs=0, arch_mode="multi")
    counts = sched.counts_for_subnets([SUB])
    masks = build_arch_masks(counts, SUPER, batch=batch)

    masked_out = supernet.apply(super_vars, x, masks)
    sub_out = subnet.apply({"params": sliced}, x)
    np.testing.assert_allclose(np.asarray(masked_out), np.asarray(sub_out),
                               rtol=2e-4, atol=2e-5)


def test_supernet_equals_sliced_subnet_after_rewiring():
    batch = 2
    x = jax.random.normal(jax.random.PRNGKey(8), (batch, IMG, IMG, 3))
    supernet = _model(SUPER)
    super_vars = _init(supernet, rng=5, batch=batch)
    rewired = rewire_params(super_vars["params"], SUPER)

    subnet = _model(SUB)
    sub_vars = _init(subnet, rng=6, batch=batch)
    sliced = slice_subnet_params(rewired, sub_vars["params"])

    sched = SupernetSchedules(SUPER, SPACE, example_per_arch=batch,
                              num_warmup_epochs=0, arch_mode="multi")
    masks = build_arch_masks(sched.counts_for_subnets([SUB]), SUPER, batch=batch)
    masked_out = supernet.apply({"params": rewired}, x, masks)
    sub_out = subnet.apply({"params": sliced}, x)
    np.testing.assert_allclose(np.asarray(masked_out), np.asarray(sub_out),
                               rtol=2e-4, atol=2e-5)


def test_batched_multi_candidate_masks():
    """Two candidates scored in one masked batch: each sub-batch matches its
    own dense subnet — the TPU replacement for per-candidate rebuilds."""
    sub2 = ((0, 16),
            (1, (16, 4, 4), (16, 32), 1),
            (1, (16, 2, 4), (16, 16), 1),
            (3, 16, 32),
            (1, (32, 2, 8), (32, 32), 1),
            (2, 32, 10))
    batch = 4  # 2 candidates x example_per_arch 2
    x = jax.random.normal(jax.random.PRNGKey(9), (batch, IMG, IMG, 3))

    supernet = _model(SUPER)
    super_vars = _init(supernet, rng=10, batch=batch)
    sched = SupernetSchedules(SUPER, SPACE, example_per_arch=2,
                              num_warmup_epochs=0, arch_mode="multi")
    counts = sched.counts_for_subnets([SUB, sub2])
    masks = build_arch_masks(counts, SUPER, batch=batch)
    batched_out = np.asarray(supernet.apply(super_vars, x, masks))

    for a, sub in enumerate((SUB, sub2)):
        subnet = _model(sub)
        sliced = slice_subnet_params(super_vars["params"],
                                     _init(subnet, rng=11, batch=batch)["params"])
        dense = np.asarray(subnet.apply({"params": sliced}, x))
        # round-robin expansion: candidate a owns examples a, a+2
        np.testing.assert_allclose(batched_out[a::2], dense[a::2],
                                   rtol=2e-4, atol=2e-5)


def test_rewiring_preserves_dense_function():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, IMG, IMG, 3))
    model = _model(SUPER)
    variables = _init(model)
    before = model.apply(variables, x)
    after = model.apply({"params": rewire_params(variables["params"], SUPER)}, x)
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               rtol=1e-4, atol=1e-5)


def test_sampled_masks_run_and_differ_across_steps():
    batch = 4
    model = _model(SUPER)
    variables = _init(model, batch=batch)
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, IMG, IMG, 3))
    sched = SupernetSchedules(SUPER, SPACE, example_per_arch=2,
                              num_warmup_epochs=0, arch_mode="multi")
    outs = []
    for step in range(2):
        counts = sched.sample(np.random.default_rng(step), batch)
        masks = build_arch_masks(counts, SUPER, batch=batch)
        outs.append(np.asarray(model.apply(variables, x, masks)))
    assert not np.allclose(outs[0], outs[1])


def test_arch_modes_shapes():
    batch = 4
    for mode, embed_a, attn_a in (("single", 1, 1), ("hybrid", 1, 2), ("multi", 2, 2)):
        sched = SupernetSchedules(SUPER, SPACE, example_per_arch=2,
                                  num_warmup_epochs=0, arch_mode=mode)
        counts = sched.sample(np.random.default_rng(0), batch)
        assert counts["embed"].shape == (embed_a,), mode
        assert counts["slots"][1]["attn"].shape == (attn_a,), mode
        assert counts["slots"][3]["embed"].shape == (embed_a,), mode


def test_registry_has_all_reference_names():
    expected = [
        "flexible_vit_sr_distill_patch14_224",
        "flexible_vit_sr_patch14_224",
        "flexible_vit_sr_distill_patch14_224_supernet",
        "flexible_vit_sr_patch14_224_supernet",
        "flexible_vit_sr_patch14_224_patch_output",
        "flexible_vit_sr_patch14_224_patch_output_supernet",
        "flexible_vit_sr_patch14_280_patch_output",
        "flexible_vit_sr_patch14_336_patch_output",
        "flexible_vit_sr_patch14_392_patch_output",
        "flexible_vit_patch16_224", "flexible_vit_patch16_224_supernet",
        "flexible_vit_patch16_192", "flexible_vit_patch16_192_supernet",
        "deit_tiny_patch16_224", "deit_small_patch16_224", "deit_base_patch16_224",
        "deit_tiny_distill_patch16_224", "deit_tiny_133X_distill_patch16_224",
        "deit_tiny_167X_distill_patch16_224", "deit_small_distill_patch16_224",
        "regnety_160_upsample",
    ]
    have = available_models()
    missing = [m for m in expected if m not in have]
    assert not missing, missing


def test_create_model_and_qkv_slicing():
    model = create_model("flexible_vit_sr_patch14_224", network_def=SUPER,
                         img_size=IMG)
    assert isinstance(model, VisionTransformerSR)

    # qkv third slicing: supernet 4 heads of dim 4 -> subnet 2 heads
    sup = _model(SUPER)
    sv = _init(sup)["params"]
    sub = _model(SUB)
    sl = slice_subnet_params(sv, _init(sub)["params"])
    full = sv["blocks_1"]["attn"]["qkv"]["kernel"]  # (16, 48)
    got = sl["blocks_1"]["attn"]["qkv"]["kernel"]   # (12, 24)
    np.testing.assert_array_equal(np.asarray(got[:, :8]), np.asarray(full[:12, 0:8]))
    np.testing.assert_array_equal(np.asarray(got[:, 8:16]), np.asarray(full[:12, 16:24]))
    np.testing.assert_array_equal(np.asarray(got[:, 16:]), np.asarray(full[:12, 32:40]))


def test_pos_embed_interpolation():
    src = _model(SUPER)
    src_vars = _init(src)
    big = VisionTransformerSR(network_def=SUPER, img_size=56, patch_size=PATCH,
                              num_classes=10)
    dst_vars = big.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    out = interpolate_pos_embeds(src_vars["params"], dst_vars["params"], num_tokens=1)
    assert out["pos_embed"].shape == dst_vars["params"]["pos_embed"].shape
    assert out["blocks_3"]["pos_embed"].shape == dst_vars["params"]["blocks_3"]["pos_embed"].shape
    # token row is copied verbatim
    np.testing.assert_array_equal(np.asarray(out["pos_embed"][:, 0]),
                                  np.asarray(src_vars["params"]["pos_embed"][:, 0]))
    # the bigger model runs with the interpolated table
    big.apply({"params": out}, jnp.ones((1, 56, 56, 3)))


def test_teacher_regnet_forward():
    model = create_model("regnety_160_upsample", num_classes=10)
    x = jnp.ones((1, 14, 14, 3))  # gets upsampled to 224 internally... too big for CPU
    # use a small custom teacher config instead
    from vit_search_tpu.models.regnet import RegNetYUpsample
    small = RegNetYUpsample.__class__  # noqa: F841 (constructor check below)
    from vit_search_tpu.models.regnet import RegNetY
    tiny = RegNetY(widths=(8, 16), depths=(1, 1), group_width=8, stem_width=8,
                   num_classes=10)
    v = tiny.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = tiny.apply(v, jnp.ones((1, 32, 32, 3)))
    assert out.shape == (1, 10)


def test_packed_counts_roundtrip_and_equivalence():
    batch = 4
    sched = SupernetSchedules(SUPER, SPACE, example_per_arch=2,
                              num_warmup_epochs=0, arch_mode="hybrid")
    rng = np.random.default_rng(0)
    counts = sched.sample(rng, batch)
    vec = sched.pack(counts, batch)
    assert vec.dtype == np.int32 and vec.ndim == 1
    unpacked = sched.unpack(jnp.asarray(vec), batch)
    # identical masks either way
    m1 = build_arch_masks(counts, SUPER, batch)
    m2 = build_arch_masks(unpacked, SUPER, batch)
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_counts_in_train_step():
    from vit_search_tpu.train import (OptimConfig, TrainConfig, TrainState,
                                      make_optimizer, make_train_step)

    batch = 4
    model = _model(SUPER)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, IMG, IMG, 3))
    y = jnp.zeros((batch,), jnp.int32)
    variables = _init(model, batch=batch)
    tx = make_optimizer(OptimConfig(steps_per_epoch=2), variables["params"])
    state = TrainState.create(variables["params"], tx)
    sched = SupernetSchedules(SUPER, SPACE, example_per_arch=2,
                              num_warmup_epochs=0, arch_mode="multi")
    step = make_train_step(model, tx, TrainConfig(num_classes=10),
                           counts_unpack=sched.unpack, donate=False)
    rng = np.random.default_rng(0)
    vec = jnp.asarray(sched.sample_packed(rng, batch))
    state, metrics = step(state, x, y, vec, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
