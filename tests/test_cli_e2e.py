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


@registry.register_model
def tiny_test_patch7_flex(**kwargs):
    """Like tiny_test_patch7_28 but honors img_size (finetune e2e)."""
    kwargs.setdefault("network_def", TEST_NET)
    kwargs.setdefault("num_classes", 4)
    kwargs.setdefault("img_size", 28)
    return VisionTransformerSR(patch_size=7, **kwargs)


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


def test_resume_from_url(supernet_run, tmp_path, monkeypatch):
    """--resume http://... downloads through the hub cache and restores the
    archived orbax checkpoint with full state + epoch (the torch.hub
    load_state_dict_from_url resume path, reference main.py:402-404)."""
    import http.server
    import shutil
    import threading

    from vit_search_tpu.cli import train as train_cli
    from vit_search_tpu.train.checkpoint import restore_raw

    supernet_out, _ = supernet_run
    # other tests in this module may have advanced the shared fixture's
    # checkpoint; read the epoch we are archiving instead of assuming it
    ckpt_epoch = int(restore_raw(
        os.path.join(supernet_out, "checkpoints", "checkpoint"))
        ["metadata"]["epoch"])
    serve_dir = tmp_path / "www"
    serve_dir.mkdir()
    shutil.make_archive(str(serve_dir / "ckpts"), "gztar",
                        os.path.join(supernet_out, "checkpoints"))

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(serve_dir), **kw)
    httpd = http.server.HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_port}/ckpts.tar.gz"
    monkeypatch.setenv("VST_HUB_CACHE", str(tmp_path / "cache"))

    out = str(tmp_path / "resumed")
    try:
        args = _train_args([
            "--model", "tiny_test_patch7_28_supernet",
            "--search-space", "tiny_test", "--example-per-arch", "4",
            "--num-warmup-epochs", "0", "--no-model-ema",
            "--output_dir", out, "--resume", url,
            "--epochs", str(ckpt_epoch + 2)])
        result = train_cli.main(args)
    finally:
        httpd.shutdown()
    # the URL resume continues at the epoch after the archived one
    assert result["epoch"] == ckpt_epoch + 1


def test_resume_from_torch_url_ema_epoch(tmp_path, monkeypatch):
    """--resume http://...pth on a reference-format *training* checkpoint
    follows main.py:402-416 semantics: --eval prefers model_ema over model;
    a training resume restores the epoch (LR-schedule position) and seeds
    EMA from the checkpoint (optimizer moments restart, logged loudly)."""
    import http.server
    import threading

    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from test_convert_torch import _synth_torch_sd

    from vit_search_tpu.cli import train as train_cli
    from vit_search_tpu.models import create_model

    model = create_model("tiny_test_patch7_28")
    zeros = jnp.zeros((1, 28, 28, 3), jnp.float32)
    params_a = model.init(jax.random.PRNGKey(11), zeros)["params"]
    params_b = model.init(jax.random.PRNGKey(22), zeros)["params"]
    to_torch = lambda sd: {k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}
    sd_a = to_torch(_synth_torch_sd(params_a, {}, TEST_NET, patch=7))
    sd_b = to_torch(_synth_torch_sd(params_b, {}, TEST_NET, patch=7))

    serve_dir = tmp_path / "www"
    serve_dir.mkdir()
    torch.save({"model": sd_a, "model_ema": sd_b, "epoch": 2},
               serve_dir / "full.pth")
    torch.save({"model": sd_b}, serve_dir / "ema_as_model.pth")

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(serve_dir), **kw)
    httpd = http.server.HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base_url = f"http://127.0.0.1:{httpd.server_port}"
    monkeypatch.setenv("VST_HUB_CACHE", str(tmp_path / "cache"))

    try:
        # eval of the full ckpt must use model_ema (weights B), i.e. match
        # evaluating a ckpt whose 'model' IS B
        stats_full = train_cli.main(_train_args(
            ["--model", "tiny_test_patch7_28", "--no-model-ema", "--eval",
             "--resume", f"{base_url}/full.pth"]))["eval"]
        stats_b = train_cli.main(_train_args(
            ["--model", "tiny_test_patch7_28", "--no-model-ema", "--eval",
             "--resume", f"{base_url}/ema_as_model.pth"]))["eval"]
        assert np.allclose(stats_full["acc1"], stats_b["acc1"])
        assert np.allclose(stats_full["loss"], stats_b["loss"], rtol=1e-6)

        # training resume: continues at epoch 3 (ckpt epoch 2 + 1), EMA on
        out = str(tmp_path / "resumed")
        result = train_cli.main(_train_args(
            ["--model", "tiny_test_patch7_28", "--model-ema",
             "--model-ema-decay", "0.9", "--output_dir", out,
             "--resume", f"{base_url}/full.pth", "--epochs", "4"]))
    finally:
        httpd.shutdown()
    assert result["epoch"] == 3
    assert "ema_test_acc1" in result


def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-training checkpoints and exits cleanly; a relaunch with
    --resume auto continues to completion (the submitit-requeue contract,
    reference run_with_submitit.py:62-72).  The interrupted epoch restarts
    from the preemption-time state (same as the reference: requeue reloads
    the last saved state and re-enters the epoch loop), so the assertion is
    the contract — clean exit, preempted_step metadata, epochs lining up —
    not bitwise equality with an uninterrupted run."""
    import signal as _signal
    import subprocess
    import sys
    import time as _time

    from vit_search_tpu.cli import train as train_cli
    from vit_search_tpu.train.checkpoint import restore_raw

    out = str(tmp_path / "preempt")
    flags = ["--model", "tiny_test_patch7_28",
             "--data-set", "SYNTHETIC:4:64:28", "--data-path", "",
             "--input-size", "28", "--batch-size", "8", "--val-bs", "8",
             "--epochs", "30", "--max-steps-per-epoch", "4",
             "--num_workers", "2", "--no-repeated-aug", "--no-bf16",
             "--warmup-epochs", "0", "--lr", "2e-3", "--reprob", "0",
             "--mixup", "0", "--cutmix", "0", "--device", "cpu",
             "--print-freq", "2", "--seed", "0", "--no-model-ema",
             "--output_dir", out]
    # the subprocess must register this module's tiny test model first
    boot = ("import sys; sys.path.insert(0, {tests_dir!r}); "
            "import test_cli_e2e; "
            "from vit_search_tpu.cli.train import main, get_args_parser; "
            "main(get_args_parser().parse_args(sys.argv[1:]))").format(
                tests_dir=os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-c", boot] + flags,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    log_path = os.path.join(out, "log.txt")
    deadline = _time.time() + 600
    try:
        # wait until at least one full epoch is logged, then preempt
        while _time.time() < deadline:
            if os.path.exists(log_path) and open(log_path).read().count("\n") >= 1:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    "train exited early:\n" + proc.stdout.read().decode())
            _time.sleep(0.5)
        else:
            raise AssertionError("timed out waiting for first epoch")
        proc.send_signal(_signal.SIGTERM)
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, proc.stdout.read().decode()

    raw = restore_raw(os.path.join(out, "checkpoints", "checkpoint"))
    meta = raw["metadata"]
    assert "preempted_step" in meta, meta
    preempt_epoch = int(meta["epoch"]) + 1  # the epoch that was interrupted

    # relaunch with --resume auto: continues at the interrupted epoch and
    # runs to the (shortened) end
    total_epochs = preempt_epoch + 2
    args = _train_args([
        "--model", "tiny_test_patch7_28", "--no-model-ema",
        "--output_dir", out, "--resume", "auto",
        "--epochs", str(total_epochs)])
    result = train_cli.main(args)
    assert result["epoch"] == total_epochs - 1
    with open(log_path) as f:
        epochs = [json.loads(line)["epoch"] for line in f]
    assert epochs[-1] == total_epochs - 1
    # the resumed segment re-logged the interrupted epoch onward
    assert preempt_epoch in epochs
    final = restore_raw(os.path.join(out, "checkpoints", "checkpoint"))
    assert int(final["metadata"]["epoch"]) == total_epochs - 1
    assert "preempted_step" not in final["metadata"]


def test_finetune_e2e_higher_resolution(tmp_path):
    """--finetune through the real CLI at a changed resolution: pos-embed
    interpolation + pre-finetune sanity eval + short finetune (reference
    main.py:351-353,453-455 + network_utils/finetune_state_dict.py)."""
    from vit_search_tpu.cli import train as train_cli

    # 1) train at 28px
    lo_out = str(tmp_path / "lo")
    lo_args = _train_args([
        "--model", "tiny_test_patch7_flex", "--epochs", "2",
        "--no-model-ema", "--output_dir", lo_out])
    lo_result = train_cli.main(lo_args)
    assert np.isfinite(lo_result["train_loss"])

    # 2) finetune at 56px (4x4 -> 8x8 token grid)
    hi_out = str(tmp_path / "hi")
    hi_args = _train_args([
        "--model", "tiny_test_patch7_flex",
        "--data-set", "SYNTHETIC:4:64:56", "--input-size", "56",
        "--epochs", "1", "--no-model-ema",
        "--finetune", os.path.join(lo_out, "checkpoints", "checkpoint"),
        "--output_dir", hi_out])
    hi_result = train_cli.main(hi_args)
    assert np.isfinite(hi_result["train_loss"])
    assert "test_acc1" in hi_result

    # the pre-finetune sanity eval ran before training: epochs+1 eval lines
    with open(os.path.join(hi_out, "verbose.log")) as f:
        eval_lines = [ln for ln in f if ln.strip().startswith("eval:")
                      or " eval: " in ln]
    assert len(eval_lines) == 2, eval_lines


def test_gelu_flag_numerics(monkeypatch):
    """--gelu tanh switches to the tanh approximation; default stays the
    exact erf GELU (reference nn.GELU numerics)."""
    import jax
    import jax.numpy as jnp

    from vit_search_tpu.models.layers import Mlp

    m = Mlp(hidden_features=16, out_features=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.delenv("VST_GELU", raising=False)
    y_exact = m.apply(v, x)
    monkeypatch.setenv("VST_GELU", "tanh")
    y_tanh = m.apply(v, x)
    diff = float(np.max(np.abs(np.asarray(y_exact) - np.asarray(y_tanh))))
    assert 0.0 < diff < 1e-2  # different op, close numerics

    # the CLI flag plumbs through the same knob
    args = _train_args(["--model", "tiny_test_patch7_28", "--gelu", "tanh"])
    assert args.gelu == "tanh"


def test_mid_epoch_preemption_resume_equivalence(tmp_path, monkeypatch):
    """A run preempted MID-epoch and resumed with --resume auto reproduces
    the uninterrupted run BITWISE: the preemption checkpoint holds the
    post-step state, and the resume skips the already-applied steps of the
    interrupted epoch (advancing the arch-sampling host RNG through them)
    instead of re-applying the whole epoch on top of the mid-epoch state.
    Supernet config so the keep-count RNG advance is exercised too."""
    from vit_search_tpu.cli import train as train_cli
    from vit_search_tpu.train.checkpoint import restore_raw

    common = ["--model", "tiny_test_patch7_28_supernet",
              "--search-space", "tiny_test", "--example-per-arch", "4",
              "--num-warmup-epochs", "0", "--no-model-ema",
              "--epochs", "3"]

    out_a = str(tmp_path / "uninterrupted")
    train_cli.main(_train_args(common + ["--output_dir", out_a]))

    class _FireAfter:  # deterministic stand-in for the SIGTERM event
        def __init__(self, n):
            self.left = n

        def is_set(self):
            self.left -= 1
            return self.left < 0

    # fire on the 7th post-step check: epoch 1 (of 3), step 2 (of 4) —
    # strictly mid-epoch
    out_b = str(tmp_path / "preempted")
    monkeypatch.setattr(train_cli, "_PREEMPTED", _FireAfter(6))
    result = train_cli.main(_train_args(common + ["--output_dir", out_b]))
    assert result.get("preempted") and (result["epoch"], result["step"]) == (1, 2)

    monkeypatch.setattr(train_cli, "_PREEMPTED", _FireAfter(10 ** 9))
    resumed = train_cli.main(_train_args(
        common + ["--output_dir", out_b, "--resume", "auto"]))
    assert resumed["epoch"] == 2

    a = restore_raw(os.path.join(out_a, "checkpoints", "checkpoint"))
    b = restore_raw(os.path.join(out_b, "checkpoints", "checkpoint"))
    import jax
    leaves_a, treedef_a = jax.tree_util.tree_flatten(a["params"])
    leaves_b, treedef_b = jax.tree_util.tree_flatten(b["params"])
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        assert np.array_equal(np.asarray(la), np.asarray(lb))


def test_mid_epoch_resume_steps_mismatch_falls_back(tmp_path, monkeypatch):
    """If the resumed run's steps_per_epoch differs from the preemption
    checkpoint's, the exact skip is impossible; the CLI re-runs the
    interrupted epoch from its start and says so loudly."""
    from vit_search_tpu.cli import train as train_cli

    class _FireAfter:
        def __init__(self, n):
            self.left = n

        def is_set(self):
            self.left -= 1
            return self.left < 0

    out = str(tmp_path / "mismatch")
    monkeypatch.setattr(train_cli, "_PREEMPTED", _FireAfter(6))
    result = train_cli.main(_train_args(
        ["--model", "tiny_test_patch7_28", "--no-model-ema",
         "--epochs", "3", "--output_dir", out]))
    assert result.get("preempted")

    # resume with a different epoch length (2 steps instead of 4)
    monkeypatch.setattr(train_cli, "_PREEMPTED", _FireAfter(10 ** 9))
    resumed = train_cli.main(_train_args(
        ["--model", "tiny_test_patch7_28", "--no-model-ema",
         "--epochs", "3", "--max-steps-per-epoch", "2",
         "--output_dir", out, "--resume", "auto"]))
    assert resumed["epoch"] == 2  # ran to completion on the fallback path
    with open(os.path.join(out, "verbose.log")) as f:
        log = f.read()
    assert "re-running the interrupted epoch from its start" in log


def test_bench_skip_eval_knob(tmp_path, monkeypatch):
    """VST_BENCH_SKIP_EVAL only acts inside the REUSE_BATCH benchmark mode
    and drops the per-epoch eval pass (no test_* keys in the log)."""
    from vit_search_tpu.cli import train as train_cli

    monkeypatch.setenv("VST_BENCH_REUSE_BATCH", "1")
    monkeypatch.setenv("VST_BENCH_SKIP_EVAL", "1")
    out = str(tmp_path / "skipeval")
    result = train_cli.main(_train_args(
        ["--model", "tiny_test_patch7_28", "--no-model-ema",
         "--output_dir", out]))
    assert "test_acc1" not in result
    assert np.isfinite(result["train_loss"])
    with open(os.path.join(out, "log.txt")) as f:
        for line in f:
            assert "test_acc1" not in json.loads(line)


def test_train_sync_window_invariance(tmp_path, monkeypatch):
    """VST_TRAIN_SYNC_EVERY only changes WHEN metrics are fetched, never
    their values: per-epoch logged losses are identical at cadence 1 vs 4."""
    from vit_search_tpu.cli import train as train_cli

    curves = {}
    for cadence in ("1", "4"):
        monkeypatch.setenv("VST_TRAIN_SYNC_EVERY", cadence)
        out = str(tmp_path / f"sync{cadence}")
        args = _train_args([
            "--model", "tiny_test_patch7_28", "--no-model-ema",
            "--output_dir", out])
        train_cli.main(args)
        with open(os.path.join(out, "log.txt")) as f:
            curves[cadence] = [json.loads(line)["train_loss"] for line in f]
    assert curves["1"] == curves["4"]
