"""End-to-end pipeline test: supernet training -> evolutionary search ->
searched-net training -> eval, all through the CLI drivers on synthetic data.

This is the BASELINE config[0]-style CPU-runnable slice plus the search
loop, exercising the same wiring the full ImageNet runs use.
"""

import json
import os

import numpy as np
import pytest

from vit_search_tpu.arch import network_def as nd
from vit_search_tpu.arch import spaces
from vit_search_tpu.models import registry
from vit_search_tpu.models.vit_sr import VisionTransformerSR

TEST_NET = ((0, 16),
            (1, (16, 2, 8), (16, 32), 1),
            (1, (16, 2, 8), (16, 32), 1),
            (3, 16, 32),
            (1, (32, 2, 16), (32, 64), 1),
            (2, 32, 4))


def _test_space():
    return [np.array([16, 8]),
            {"attn": np.array([16, 8]), "mlp": np.array([32, 16]), "layer": None},
            {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
             "layer": np.array([16, 0])},
            np.array([32, 16]),
            {"attn": np.array([32, 16]), "mlp": np.array([64, 32]), "layer": None},
            None]


spaces.register_space("tiny_test", _test_space)


@registry.register_model
def tiny_test_patch7_28(**kwargs):
    kwargs.setdefault("network_def", TEST_NET)
    kwargs.setdefault("num_classes", 4)
    kwargs.pop("img_size", None)
    return VisionTransformerSR(img_size=28, patch_size=7, **kwargs)


@registry.register_model
def tiny_test_patch7_28_supernet(**kwargs):
    return tiny_test_patch7_28(**kwargs)


def _train_args(extra):
    from vit_search_tpu.cli.train import get_args_parser
    base = ["--data-set", "SYNTHETIC:4:64:28", "--data-path", "",
            "--input-size", "28", "--batch-size", "8", "--val-bs", "8",
            "--epochs", "2", "--max-steps-per-epoch", "4",
            "--num_workers", "2", "--no-repeated-aug", "--no-bf16",
            "--warmup-epochs", "0", "--lr", "2e-3", "--reprob", "0",
            "--mixup", "0", "--cutmix", "0", "--device", "cpu",
            "--print-freq", "2", "--seed", "0"]
    return get_args_parser().parse_args(base + extra)


@pytest.fixture(scope="module")
def supernet_run(tmp_path_factory):
    from vit_search_tpu.cli import train as train_cli
    out = str(tmp_path_factory.mktemp("supernet"))
    args = _train_args([
        "--model", "tiny_test_patch7_28_supernet",
        "--search-space", "tiny_test", "--example-per-arch", "4",
        "--num-warmup-epochs", "0", "--no-model-ema",
        "--output_dir", out])
    result = train_cli.main(args)
    return out, result


def test_supernet_training_end_to_end(supernet_run):
    out, result = supernet_run
    assert np.isfinite(result["train_loss"])
    assert "test_acc1" in result
    # JSON per-epoch log lines (reference main.py:501-503)
    with open(os.path.join(out, "log.txt")) as f:
        lines = [json.loads(line) for line in f]
    assert len(lines) == 2
    assert lines[-1]["epoch"] == 1
    # checkpoint protocol
    assert os.path.isdir(os.path.join(out, "checkpoints", "checkpoint"))
    assert os.path.isdir(os.path.join(out, "checkpoints", "best"))
    # logger files
    for name in ("verbose.log", "event.log", "debug.log"):
        assert os.path.exists(os.path.join(out, name))


def test_eval_only_path(supernet_run):
    from vit_search_tpu.cli import train as train_cli
    out, _ = supernet_run
    args = _train_args([
        "--model", "tiny_test_patch7_28_supernet",
        "--search-space", "tiny_test", "--example-per-arch", "4",
        "--no-model-ema", "--output_dir", out, "--resume", "auto", "--eval"])
    result = train_cli.main(args)
    assert "acc1" in result["eval"]


def test_resume_continues(supernet_run, tmp_path):
    from vit_search_tpu.cli import train as train_cli
    out, _ = supernet_run
    args = _train_args([
        "--model", "tiny_test_patch7_28_supernet",
        "--search-space", "tiny_test", "--example-per-arch", "4",
        "--num-warmup-epochs", "0", "--no-model-ema",
        "--output_dir", out, "--resume", "auto", "--epochs", "3"])
    result = train_cli.main(args)
    assert result["epoch"] == 2  # resumed at epoch 2 (0,1 already done)


def test_evolutionary_search_end_to_end(supernet_run, tmp_path):
    from vit_search_tpu.arch import ComputationEstimator
    from vit_search_tpu.cli import evo_search as evo_cli

    supernet_out, _ = supernet_run
    out = str(tmp_path / "search")
    est = ComputationEstimator(distill=False, input_resolution=28, patch_size=7)
    constraint = est(TEST_NET) * 0.7

    parser_args = [
        "--data-path", "", "--data-set", "SYNTHETIC:4:32:28",
        "--val-bs", "8", "--num_workers", "2", "--input-size", "28",
        "--model", "tiny_test_patch7_28",
        "--model-path", os.path.join(supernet_out, "checkpoints", "checkpoint"),
        "--network-def", repr(TEST_NET), "--search-space", "tiny_test",
        "--constraint-value", str(constraint),
        "--search-iter", "2", "--init-popu-size", "6",
        "--parent-size", "4", "--mutate-size", "3",
        "--patch-size", "7", "--arch-batch", "3", "--no-bf16",
        "--max-eval-batches", "2", "--output_dir", out,
    ]
    from vit_search_tpu.cli.evo_search import get_args_parser
    args = get_args_parser().parse_args(parser_args)
    result = evo_cli.main(args)

    best = result["best_network_def"]
    nd.validate(best)
    assert est(best) <= constraint
    assert 0.0 <= result["best_score"] <= 100.0
    # artifacts parity: per-iter pickles/txt + summary + csv
    assert os.path.exists(os.path.join(out, "iter@0_popu.pickle"))
    assert os.path.exists(os.path.join(out, "iter@1_popu.txt"))
    assert os.path.exists(os.path.join(out, "summary.txt"))
    assert os.path.exists(os.path.join(out, "history.csv"))


def test_searched_net_training_with_inherited_weights(supernet_run, tmp_path):
    """Searched-net training from supernet weights (--resume-supernet-weights,
    reference main.py:418-424)."""
    from vit_search_tpu.cli import train as train_cli

    supernet_out, _ = supernet_run
    sub_def = ((0, 8),
               (1, (8, 1, 8), (8, 16), 1),
               (1, (8, 1, 8), (8, 16), 0),
               (3, 8, 16),
               (1, (16, 1, 16), (16, 32), 1),
               (2, 16, 4))
    out = str(tmp_path / "searched")
    args = _train_args([
        "--model", "tiny_test_patch7_28",
        "--network-def", repr(sub_def),
        "--epochs", "1", "--no-model-ema",
        "--resume-supernet-weights",
        os.path.join(supernet_out, "checkpoints", "checkpoint"),
        "--output_dir", out])
    result = train_cli.main(args)
    assert np.isfinite(result["train_loss"])


def test_kd_training_with_teacher_from_ckpt_args(supernet_run, tmp_path):
    """End-to-end KD through the CLI: the teacher is rebuilt from its
    checkpoint's embedded args (reference utils.py:218-238) — the
    --teacher-model flag deliberately names a different (wrong) model and
    must be overridden by the ckpt's own 'model' entry."""
    from vit_search_tpu.cli import train as train_cli

    # 1) train a tiny dense "teacher" and checkpoint it (its metadata
    #    embeds vars(args) including model='tiny_test_patch7_28')
    t_out = str(tmp_path / "teacher")
    t_args = _train_args([
        "--model", "tiny_test_patch7_28", "--epochs", "1",
        "--no-model-ema", "--output_dir", t_out])
    train_cli.main(t_args)
    teacher_ckpt = os.path.join(t_out, "checkpoints", "checkpoint")

    # 2) distill a student from it; wrong --teacher-model on purpose
    s_out = str(tmp_path / "student")
    s_args = _train_args([
        "--model", "tiny_test_patch7_28", "--epochs", "1",
        "--no-model-ema", "--output_dir", s_out,
        "--teacher-ckpt-path", teacher_ckpt,
        "--teacher-model", "regnety_160_upsample",
        "--distill-alpha", "0.5"])
    result = train_cli.main(s_args)
    assert np.isfinite(result["train_loss"])
    assert "test_acc1" in result


def test_build_teacher_unit(tmp_path):
    """build_teacher prefers ckpt-embedded args over the CLI default and
    falls back to the flag when no args are embedded."""
    import jax
    import jax.numpy as jnp

    from vit_search_tpu.cli.train import build_teacher
    from vit_search_tpu.train import CheckpointManager, TrainState
    from vit_search_tpu.train.optim import OptimConfig, make_optimizer
    from vit_search_tpu.utils import file_logger

    model = registry.create_model("tiny_test_patch7_28", num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 28, 28, 3)))
    tx = make_optimizer(OptimConfig(), variables["params"])
    state = TrainState.create(variables["params"], tx)
    logger = file_logger(None, is_master=True)

    # with embedded args: model name + nb_classes come from the ckpt
    mgr = CheckpointManager(str(tmp_path / "with_args"), snapshot_every=0)
    mgr.save_epoch(state, epoch=0, metadata={
        "args": {"model": "tiny_test_patch7_28", "nb_classes": 4}})
    apply_fn = build_teacher(str(tmp_path / "with_args" / "checkpoint"),
                             "regnety_160_upsample", 4, jnp.float32, logger)
    out = apply_fn(jnp.zeros((2, 28, 28, 3)))
    assert out.shape == (2, 4)

    # without embedded args: the CLI-provided name is used
    mgr2 = CheckpointManager(str(tmp_path / "plain"), snapshot_every=0)
    mgr2.save_epoch(state, epoch=0, metadata={})
    apply_fn2 = build_teacher(str(tmp_path / "plain" / "checkpoint"),
                              "tiny_test_patch7_28", 4, jnp.float32, logger)
    out2 = apply_fn2(jnp.zeros((2, 28, 28, 3)))
    assert out2.shape == (2, 4)


def test_drop_block_rejected():
    """--drop-block must fail loudly: the reference forwards it to timm
    create_model (main.py:90-95,249) where ViT factories reject the kwarg."""
    from vit_search_tpu.cli import train as train_cli
    args = _train_args(["--model", "tiny_test_patch7_28",
                        "--drop-block", "0.1"])
    with pytest.raises(NotImplementedError, match="drop-block"):
        train_cli.main(args)


def test_model_ema_force_cpu(tmp_path):
    """--model-ema-force-cpu keeps the EMA copy on the host (reference
    main.py:136-137 / timm ModelEma(device='cpu')): same EMA numbers as
    the device path, same checkpoint layout, EMA eval + resume work."""
    import jax

    from vit_search_tpu.cli import train as train_cli
    from vit_search_tpu.train.checkpoint import restore_raw

    outs = {}
    for tag, extra in [("device", []), ("cpu", ["--model-ema-force-cpu"])]:
        out = str(tmp_path / tag)
        args = _train_args([
            "--model", "tiny_test_patch7_28",
            "--model-ema", "--model-ema-decay", "0.9",
            "--output_dir", out] + extra)
        result = train_cli.main(args)
        assert "ema_test_acc1" in result, f"{tag}: EMA eval missing"
        outs[tag] = out

    for name in ("checkpoint", "best_ema"):
        a = restore_raw(os.path.join(outs["device"], "checkpoints", name))
        b = restore_raw(os.path.join(outs["cpu"], "checkpoints", name))
        for pa, pb in zip(jax.tree_util.tree_leaves(a["ema_params"]),
                          jax.tree_util.tree_leaves(b["ema_params"])):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=0, atol=1e-6)

    # eval-only resume picks the host EMA tree
    args = _train_args([
        "--model", "tiny_test_patch7_28",
        "--model-ema", "--model-ema-decay", "0.9", "--model-ema-force-cpu",
        "--output_dir", outs["cpu"], "--resume", "auto", "--eval"])
    result = train_cli.main(args)
    assert "acc1" in result["eval"]
