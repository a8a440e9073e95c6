"""Multi-host (multi-process) correctness.

The reference's pod story is DDP over NCCL, validated by running on 8 GPUs
(scripts/vit-sr-nas/*, ``torch.distributed.launch``).  Here the equivalent
contract is: a 2-process ``jax.distributed`` run over the same 8-device
global mesh must produce IDENTICAL numbers to the 1-process run — global
batches assembled with ``jax.make_array_from_process_local_data``
(parallel/mesh.py), replicated state, GSPMD-global metrics.

Both tests spawn real second processes (Gloo collectives on CPU).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode, nproc, outdir, cli_args=()):
    port = _free_port()
    env = dict(os.environ)
    # the workers force their own platform/device-count settings
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, mode, str(r), str(nproc), str(port),
         str(outdir), *cli_args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(nproc)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = []
    for r in range(nproc):
        with open(os.path.join(outdir, f"result_rank{r}.json")) as f:
            results.append(json.load(f))
    return results


def test_two_process_train_matches_single_process(tmp_path):
    """3 supernet train steps + eval on identical global data: 2-process
    run == 1-process run, and both ranks agree (global metrics)."""
    two = _run_workers("lib", 2, tmp_path)
    os.makedirs(tmp_path / "one", exist_ok=True)
    one = _run_workers("lib", 1, tmp_path / "one")

    r0, r1 = two
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    for k in r0["eval"]:
        assert r0["eval"][k] == r1["eval"][k], k

    np.testing.assert_allclose(r0["losses"], one[0]["losses"],
                               rtol=1e-5, atol=1e-5)
    for k in r0["eval"]:
        np.testing.assert_allclose(r0["eval"][k], one[0]["eval"][k],
                                   rtol=1e-5, atol=1e-4)
    assert all(np.isfinite(r0["losses"]))


@pytest.mark.parametrize("nproc", [2])
def test_cli_eval_two_process_matches_single(tmp_path, nproc):
    """The actual train CLI in --eval mode: per-host sharded val loader,
    global top-1/top-5/loss identical between 1- and 2-process runs (the
    deterministic eval transform makes the comparison exact)."""
    cli_args = [
        "--eval",
        "--data-set", "SYNTHETIC:4:64:28", "--data-path", "",
        "--input-size", "28", "--batch-size", "8", "--val-bs", "8",
        "--num_workers", "2", "--no-repeated-aug",
        "--model", "tiny_test_patch7_28",
        "--epochs", "1", "--seed", "3",
        "--mixup", "0.0", "--cutmix", "0.0", "--reprob", "0.0",
        "--drop-path", "0.0",
    ]
    os.makedirs(tmp_path / "two", exist_ok=True)
    os.makedirs(tmp_path / "one", exist_ok=True)
    two = _run_workers("cli", nproc, tmp_path / "two", cli_args)
    one = _run_workers("cli", 1, tmp_path / "one", cli_args)

    assert two[0] == two[1]  # both ranks report the same global stats
    for k in ("acc1", "acc5", "loss"):
        np.testing.assert_allclose(two[0]["eval"][k], one[0]["eval"][k],
                                   rtol=1e-5, atol=1e-4), k


def test_cli_evo_search_two_process_matches_single(tmp_path):
    """The evo-search CLI across 2 jax.distributed processes: per-host
    sharded sub-val loaders + mesh-sharded candidate scoring produce the
    same best candidate and score as the 1-process run (the reference's
    8-GPU DDP candidate eval contract)."""
    import numpy as np

    from vit_search_tpu.arch import ComputationEstimator

    # train a tiny supernet once (1 process) to produce the checkpoint
    sup_out = tmp_path / "supernet"
    os.makedirs(sup_out, exist_ok=True)
    train_args = [
        "--data-set", "SYNTHETIC:4:64:28", "--data-path", "",
        "--input-size", "28", "--batch-size", "8", "--val-bs", "8",
        "--epochs", "1", "--max-steps-per-epoch", "4",
        "--num_workers", "2", "--no-repeated-aug", "--no-bf16",
        "--warmup-epochs", "0", "--reprob", "0", "--mixup", "0",
        "--cutmix", "0", "--seed", "0",
        "--model", "tiny_test_patch7_28_supernet",
        "--search-space", "tiny_test", "--example-per-arch", "4",
        "--num-warmup-epochs", "0", "--no-model-ema",
        "--output_dir", str(sup_out)]
    _run_workers("cli", 1, sup_out, train_args)

    from test_cli_e2e import TEST_NET

    est = ComputationEstimator(distill=False, input_resolution=28,
                               patch_size=7)
    evo_args = [
        "--data-path", "", "--data-set", "SYNTHETIC:4:32:28",
        "--val-bs", "8", "--num_workers", "2", "--input-size", "28",
        "--model", "tiny_test_patch7_28",
        "--model-path", os.path.join(sup_out, "checkpoints", "checkpoint"),
        "--network-def", repr(TEST_NET), "--search-space", "tiny_test",
        "--constraint-value", str(est(TEST_NET) * 0.7),
        "--search-iter", "2", "--init-popu-size", "6",
        "--parent-size", "4", "--mutate-size", "3", "--no-bf16",
        "--arch-batch", "3", "--seed", "0", "--patch-size", "7"]
    os.makedirs(tmp_path / "two", exist_ok=True)
    os.makedirs(tmp_path / "one", exist_ok=True)
    two = _run_workers("cli-evo", 2, tmp_path / "two", evo_args)
    one = _run_workers("cli-evo", 1, tmp_path / "one", evo_args)

    assert two[0]["best_network_def"] == two[1]["best_network_def"]
    assert two[0]["best_network_def"] == one[0]["best_network_def"]
    np.testing.assert_allclose(two[0]["best_per_iter"], two[1]["best_per_iter"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(two[0]["best_per_iter"], one[0]["best_per_iter"],
                               rtol=1e-5, atol=1e-4)
