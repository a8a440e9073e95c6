"""Training-layer integration tests (tiny nets, synthetic data, CPU mesh)."""

import dataclasses
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_search_tpu.models import SupernetSchedules, VisionTransformerSR
from vit_search_tpu.parallel import create_mesh, replicate, shard_batch
from vit_search_tpu.train import (CheckpointManager, OptimConfig, TrainConfig,
                                  TrainState, cosine_schedule, make_eval_step,
                                  make_optimizer, make_train_step,
                                  restore_raw, weight_decay_mask)

NET = ((0, 16),
       (1, (16, 2, 8), (16, 32), 1),
       (3, 16, 32),
       (1, (32, 2, 16), (32, 64), 1),
       (2, 32, 4))
IMG, PATCH, NCLS = 28, 7, 4


def _model(**kw):
    return VisionTransformerSR(network_def=NET, img_size=IMG, patch_size=PATCH,
                               num_classes=NCLS, **kw)


def _synthetic_batch(rng, batch=8):
    labels = rng.integers(0, NCLS, size=(batch,))
    # images whose mean encodes the class -> easy to fit
    images = rng.normal(size=(batch, IMG, IMG, 3)).astype(np.float32) * 0.1
    images += labels[:, None, None, None].astype(np.float32) / NCLS
    return jnp.asarray(images), jnp.asarray(labels)


def _fit(config, steps=12, use_ema=False, model=None):
    model = model or _model()
    x, y = _synthetic_batch(np.random.default_rng(0))
    variables = model.init(jax.random.PRNGKey(0), x)
    ocfg = OptimConfig(base_lr=2e-3, warmup_epochs=0, epochs=1,
                       steps_per_epoch=steps, global_batch_size=512,
                       weight_decay=0.01)
    tx = make_optimizer(ocfg, variables["params"])
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats"), use_ema=use_ema)
    step = make_train_step(model, tx, config, schedule=cosine_schedule(ocfg))
    losses = []
    for _ in range(steps):
        state, metrics = step(state, x, y, None, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    return model, state, losses


def test_loss_decreases_plain():
    _, state, losses = _fit(TrainConfig(num_classes=NCLS, smoothing=0.1))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert int(state.step) == len(losses)


def test_loss_decreases_with_mixup_and_token_mixup():
    for mode in ("mixup", "token"):
        model = _model(patch_output=True) if mode == "token" else _model()
        _, _, losses = _fit(TrainConfig(num_classes=NCLS, mixup_mode=mode,
                                        patch_len=2), model=model)
        assert np.isfinite(losses).all(), mode
        assert losses[-1] < losses[0] * 1.5, (mode, losses)


def test_supernet_training_step_with_sampled_counts():
    import vit_search_tpu.arch.network_def  # noqa: F401

    model = _model()
    space = [np.array([16, 8]),
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]), "layer": None},
             np.array([32, 16]),
             {"attn": np.array([32, 16]), "mlp": np.array([64, 32]),
              "layer": np.array([32, 0])},
             None]
    sched = SupernetSchedules(NET, space, example_per_arch=2,
                              num_warmup_epochs=0, arch_mode="multi")
    x, y = _synthetic_batch(np.random.default_rng(0))
    variables = model.init(jax.random.PRNGKey(0), x)
    ocfg = OptimConfig(base_lr=1e-3, warmup_epochs=0, epochs=1, steps_per_epoch=8)
    tx = make_optimizer(ocfg, variables["params"])
    state = TrainState.create(variables["params"], tx)
    step = make_train_step(model, tx, TrainConfig(num_classes=NCLS))
    host_rng = np.random.default_rng(0)
    losses = []
    for _ in range(8):
        counts = sched.sample(host_rng, batch=x.shape[0])
        state, metrics = step(state, x, y, counts, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ema_tracks_params():
    cfg = TrainConfig(num_classes=NCLS, ema_decay=0.5)
    _, state, _ = _fit(cfg, steps=6, use_ema=True)
    # EMA must differ from params but stay close after warm steps
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, state.ema_params)
    max_diff = max(jax.tree.leaves(diff))
    assert 0 < max_diff < 1.0


def test_eval_step_metrics():
    model = _model(distill_token=True)
    x, y = _synthetic_batch(np.random.default_rng(1))
    variables = model.init(jax.random.PRNGKey(0), x)
    ev = make_eval_step(model)
    metrics = ev(variables["params"], None, x, y)
    assert float(metrics["count"]) == x.shape[0]
    for key in ("top1", "top5", "dst_top1", "jnt_top1", "loss_sum"):
        assert key in metrics
    assert 0 <= float(metrics["top1"]) <= x.shape[0]
    assert float(metrics["top5"]) >= float(metrics["top1"])


def test_weight_decay_mask_excludes_tokens_and_1d():
    model = _model()
    x, _ = _synthetic_batch(np.random.default_rng(0), batch=2)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mask = weight_decay_mask(params)
    assert mask["tokens"] is False
    assert mask["norm"]["scale"] is False
    assert mask["cls_head"]["kernel"] is True
    assert mask["pos_embed"] is True  # reference decays pos_embed (3-D param)


def test_cosine_schedule_timm_goldens():
    """Pins the per-epoch LR curve to timm 0.3.2 CosineLRScheduler for the
    published 300-epoch recipe (reference main.py:110-131,388,462: warmup 5,
    cosine over the FULL t_initial=300 — warmup not subtracted — constant
    within an epoch).  Goldens hand-derived from timm 0.3.2
    scheduler/cosine_lr.py:_get_lr (timm itself is not installed here)."""
    from vit_search_tpu.train.optim import timm_epoch_lrs

    cfg = OptimConfig(base_lr=5e-4, min_lr=1e-5, warmup_lr=1e-6,
                      warmup_epochs=5, epochs=300, steps_per_epoch=10,
                      global_batch_size=1024)
    assert cfg.scaled_lr == pytest.approx(1e-3)
    lrs = timm_epoch_lrs(cfg)
    golden = {0: 1e-06, 1: 2.008e-04, 4: 8.002e-04,
              5: 9.99321619703514e-04,     # first cosine epoch < peak
              6: 9.990232305719944e-04,
              150: 5.05e-04, 299: 1.002714116407149e-05}
    for t, v in golden.items():
        assert lrs[t] == pytest.approx(v, rel=1e-9), t

    # per-step schedule is constant within an epoch and clips past the end
    sched = cosine_schedule(cfg)
    assert float(sched(0)) == pytest.approx(1e-6, rel=1e-5)
    assert float(sched(9)) == pytest.approx(1e-6, rel=1e-5)
    assert float(sched(10)) == pytest.approx(golden[1], rel=1e-5)
    assert float(sched(2999)) == pytest.approx(golden[299], rel=1e-5)
    assert float(sched(5000)) == pytest.approx(golden[299], rel=1e-5)

    # 120-epoch supernet recipe (global batch 512 -> peak 5e-4)
    sup = OptimConfig(base_lr=5e-4, warmup_epochs=5, epochs=120,
                      global_batch_size=512)
    slrs = timm_epoch_lrs(sup)
    assert slrs[5] == pytest.approx(4.979039910365836e-04, rel=1e-9)
    assert slrs[119] == pytest.approx(1.0083955380988473e-05, rel=1e-9)


def test_lr_noise_timm_semantics():
    """--lr-noise: multiplicative noise seeded torch.manual_seed(seed+t),
    resampled until |n| < noise_pct, applied only inside the on/off range
    (timm 0.3.2 Scheduler._add_noise)."""
    import torch

    from vit_search_tpu.train.optim import timm_epoch_lrs

    base = OptimConfig(base_lr=5e-4, warmup_epochs=0, epochs=10,
                       global_batch_size=512, seed=7)
    quiet = timm_epoch_lrs(base)
    noisy = timm_epoch_lrs(dataclasses.replace(base, lr_noise=(0.5, 0.8)))
    # noise window = [5, 8): identical outside, perturbed inside
    for t in range(10):
        inside = 5 <= t < 8
        if not inside:
            assert noisy[t] == quiet[t], t
            continue
        g = torch.Generator()
        g.manual_seed(7 + t)
        while True:
            n = torch.randn(1, generator=g).item()
            if abs(n) < 0.67:
                break
        assert noisy[t] == pytest.approx(quiet[t] * (1 + n), rel=1e-12), t


def test_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(num_classes=NCLS)
    model, state, _ = _fit(cfg, steps=3)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), snapshot_every=2)
    mgr.save_epoch(state, epoch=1, metadata={"acc": 12.5}, is_best=True)
    assert mgr.exists("checkpoint") and mgr.exists("best") and mgr.exists("epoch@1")

    fresh_model, fresh_state, _ = _fit(cfg, steps=1)
    restored, meta = mgr.restore("checkpoint", fresh_state)
    assert meta["epoch"] == 1 and meta["acc"] == 12.5
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    raw = restore_raw(str(tmp_path / "ckpt" / "best"))
    assert "params" in raw
    assert raw["metadata"]["acc"] == 12.5


def test_data_parallel_step_on_mesh():
    """The multi-chip path: params replicated, batch sharded over 8 CPU
    devices; GSPMD inserts the gradient psum."""
    mesh = create_mesh()
    assert mesh.devices.size == 8
    model = _model()
    x, y = _synthetic_batch(np.random.default_rng(0), batch=16)
    variables = model.init(jax.random.PRNGKey(0), x)
    ocfg = OptimConfig(base_lr=1e-3, warmup_epochs=0, epochs=1, steps_per_epoch=4)
    tx = make_optimizer(ocfg, variables["params"])
    state = TrainState.create(variables["params"], tx)
    step = make_train_step(model, tx, TrainConfig(num_classes=NCLS), donate=False)

    state = replicate(mesh, state)
    xs, ys = shard_batch(mesh, (x, y))
    losses = []
    for _ in range(4):
        state, metrics = step(state, xs, ys, None, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # single-device result matches the sharded result (same math)
    state2 = TrainState.create(variables["params"], tx)
    step2 = make_train_step(model, tx, TrainConfig(num_classes=NCLS), donate=False)
    for _ in range(4):
        state2, m2 = step2(state2, x, y, None, jax.random.PRNGKey(0))
    np.testing.assert_allclose(losses[-1], float(m2["loss"]), rtol=1e-4)


def test_model_learns_to_high_accuracy():
    """Full-stack learning check on a separable synthetic task (replaces
    real-data validation in this offline environment)."""
    model = _model()
    x, y = _synthetic_batch(np.random.default_rng(3), batch=32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ocfg = OptimConfig(base_lr=5e-3, warmup_epochs=0, epochs=1,
                       steps_per_epoch=40, global_batch_size=512,
                       weight_decay=0.0, min_lr=1e-3)
    tx = make_optimizer(ocfg, variables["params"])
    state = TrainState.create(variables["params"], tx)
    step = make_train_step(model, tx, TrainConfig(num_classes=NCLS, smoothing=0.0),
                           schedule=cosine_schedule(ocfg))
    for _ in range(40):
        state, metrics = step(state, x, y, None, jax.random.PRNGKey(1))
    ev = make_eval_step(model)
    m = ev(state.params, None, x, y)
    acc = float(m["top1"]) / float(m["count"])
    assert acc >= 0.9, (acc, float(metrics["loss"]))


def test_remat_matches_non_remat():
    from vit_search_tpu.models import VisionTransformerSR

    x, y = _synthetic_batch(np.random.default_rng(0), batch=4)
    base = _model()
    rem = VisionTransformerSR(network_def=NET, img_size=IMG, patch_size=PATCH,
                              num_classes=NCLS, remat=True)
    v = base.init(jax.random.PRNGKey(0), x)

    def loss(model, params):
        return jnp.mean(model.apply({"params": params}, x) *
                        jax.nn.one_hot(y, NCLS))

    l1, g1 = jax.value_and_grad(lambda p: loss(base, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(rem, p))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_supernet_masked_step():
    """remat + masked supernet forward/backward (larger-batch memory mode)."""
    from vit_search_tpu.models import VisionTransformerSR

    space = [np.array([16, 8]),
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]), "layer": None},
             np.array([32, 16]),
             {"attn": np.array([32, 16]), "mlp": np.array([64, 32]),
              "layer": np.array([32, 0])},
             None]
    model = VisionTransformerSR(network_def=NET, img_size=IMG, patch_size=PATCH,
                                num_classes=NCLS, remat=True, drop_path_rate=0.1)
    sched = SupernetSchedules(NET, space, example_per_arch=2,
                              num_warmup_epochs=0, arch_mode="multi")
    x, y = _synthetic_batch(np.random.default_rng(0), batch=4)
    variables = model.init(jax.random.PRNGKey(0), x)
    ocfg = OptimConfig(steps_per_epoch=2)
    tx = make_optimizer(ocfg, variables["params"])
    state = TrainState.create(variables["params"], tx)
    step = make_train_step(model, tx, TrainConfig(num_classes=NCLS),
                           counts_unpack=sched.unpack, donate=False)
    vec = jnp.asarray(sched.sample_packed(np.random.default_rng(0), 4))
    state, metrics = step(state, x, y, vec, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_prefetch_to_mesh_order_and_sharding():
    from vit_search_tpu.parallel import batch_sharding, prefetch_to_mesh

    mesh = create_mesh()
    batches = [(np.full((8, 4), i, np.float32), np.arange(8) + i)
               for i in range(5)]
    out = list(prefetch_to_mesh(batches, mesh, depth=2))
    assert len(out) == 5
    for i, (images, labels) in enumerate(out):
        assert images.sharding.is_equivalent_to(batch_sharding(mesh), 2)
        np.testing.assert_array_equal(np.asarray(images), batches[i][0])
        np.testing.assert_array_equal(np.asarray(labels), batches[i][1])
    # depth larger than the stream
    out = list(prefetch_to_mesh(batches[:2], mesh, depth=8))
    assert len(out) == 2
    # empty stream
    assert list(prefetch_to_mesh([], mesh)) == []


def test_lr_schedule_step_tanh_and_loud_failure():
    """--sched step/tanh follow timm 0.3.2 semantics; anything else
    (incl. timm's metric-driven 'plateau') raises instead of silently
    training with cosine (reference main.py:110,388 routes --sched
    through timm create_scheduler)."""
    import math

    from vit_search_tpu.train import OptimConfig
    from vit_search_tpu.train.optim import timm_epoch_lrs

    base = dict(base_lr=5e-4, global_batch_size=512, warmup_epochs=2,
                warmup_lr=1e-6, min_lr=1e-5, epochs=90)

    # step: peak * 0.1^(t // 30) after warmup; warmup epochs count toward t
    lrs = timm_epoch_lrs(OptimConfig(**base, sched="step",
                                     decay_epochs=30, decay_rate=0.1))
    assert lrs[0] == pytest.approx(1e-6)
    assert lrs[2] == pytest.approx(5e-4)          # t=2 -> 2//30 == 0
    assert lrs[29] == pytest.approx(5e-4)
    assert lrs[30] == pytest.approx(5e-5)
    assert lrs[60] == pytest.approx(5e-6)
    assert lrs[89] == pytest.approx(5e-6)

    # tanh: timm 0.3.2 TanhLRScheduler lb=-6, ub=4
    lrs = timm_epoch_lrs(OptimConfig(**base, sched="tanh"))
    t, epochs = 45, 90
    tr = t / epochs
    expect = 1e-5 + 0.5 * (5e-4 - 1e-5) * (
        1.0 - math.tanh(-6.0 * (1.0 - tr) + 4.0 * tr))
    assert lrs[t] == pytest.approx(expect)
    assert lrs[2] == pytest.approx(5e-4, rel=1e-2)   # tanh(-6) ~ -1
    assert lrs[89] < 2e-5                            # decays toward min
    assert all(a >= b - 1e-12 for a, b in zip(lrs[2:], lrs[3:]))  # monotone

    for bad in ("plateau", "multistep", "poly"):
        with pytest.raises(ValueError, match="sched"):
            timm_epoch_lrs(OptimConfig(**base, sched=bad))


def test_step_sched_rejects_zero_decay_epochs():
    """--decay-epochs 0 with --sched step must raise a clear argument error,
    not a ZeroDivisionError deep in the schedule table."""
    import pytest

    from vit_search_tpu.train.optim import OptimConfig, lr_schedule

    with pytest.raises(ValueError, match="decay-epochs"):
        lr_schedule(OptimConfig(sched="step", decay_epochs=0))


def test_unpack_checkpoint_archive_rejects_tar_slip_and_reads_xz(tmp_path):
    """--resume URL archives are untrusted input: a tar member with a ../
    path must not escape the extraction dir (checkpoint.py extracts with
    filter="data"), and every tarfile compression the gate admits
    (.tar[.gz|.bz2|.xz]) must extract."""
    import tarfile

    from vit_search_tpu.train.checkpoint import unpack_checkpoint_archive

    # a minimal orbax-looking checkpoint directory
    src = tmp_path / "checkpoint"
    src.mkdir()
    (src / "_METADATA").write_text("{}")

    for ext, mode in [("tar.xz", "w:xz"), ("tar.bz2", "w:bz2")]:
        arch = tmp_path / f"good.{ext}"
        with tarfile.open(arch, mode) as tf:
            tf.add(src, arcname="checkpoint")
        out = unpack_checkpoint_archive(str(arch))
        assert out.endswith("checkpoint") and os.path.isdir(out)

    evil = tmp_path / "evil.tar"
    with tarfile.open(evil, "w") as tf:
        tf.add(src / "_METADATA", arcname="../../escaped")
        tf.add(src, arcname="checkpoint")
    victim = tmp_path / "escaped"
    try:
        unpack_checkpoint_archive(str(evil))
    except tarfile.FilterError:
        pass  # rejecting the whole archive is also safe
    assert not victim.exists()
    assert not (tmp_path.parent / "escaped").exists()
