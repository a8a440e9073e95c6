"""Subprocess worker for the multi-host (2-process) tests.

Usage: python _dist_worker.py <mode> <rank> <nproc> <port> <outdir> [cli args...]

``mode``:
- ``lib`` — run the shared library scenario (train steps + eval on a tiny
  supernet with a global batch) and dump its metrics to JSON;
- ``cli`` — forward the remaining argv to ``vit_search_tpu.cli.train`` and
  dump its result dict.

Forces the CPU platform with 4 virtual devices per process, so a 2-process
run forms an 8-device global mesh — the same shape the single-process test
mesh uses.
"""

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (vit_search_tpu pkg)


def run_lib_scenario():
    """Deterministic train/eval on a tiny supernet over the global mesh.

    Every process builds the SAME global batch and counts; each feeds only
    its process-local slice through ``shard_batch``.  All returned metrics
    are global, so they must be identical across processes AND identical to
    a single-process run on the same global data.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_search_tpu.models import SupernetSchedules, VisionTransformerSR
    from vit_search_tpu.parallel import create_mesh, replicate, shard_batch
    from vit_search_tpu.train import (OptimConfig, TrainConfig, TrainState,
                                      cosine_schedule, make_eval_step,
                                      make_optimizer, make_train_step)

    net = ((0, 16),
           (1, (16, 2, 8), (16, 32), 1),
           (1, (16, 2, 8), (16, 32), 1),
           (3, 16, 32),
           (1, (32, 2, 16), (32, 64), 1),
           (2, 32, 8))
    space = [np.array([16, 8]),
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
              "layer": None},
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
              "layer": np.array([16, 0])},
             np.array([32, 16]),
             {"attn": np.array([32, 16]), "mlp": np.array([64, 32]),
              "layer": None},
             None]

    model = VisionTransformerSR(network_def=net, img_size=28, patch_size=7,
                                num_classes=8, patch_output=True,
                                drop_path_rate=0.1, dropout_rate=0.0)
    mesh = create_mesh()
    assert mesh.devices.size == 8, mesh.devices.size

    global_b = 16
    rng = np.random.default_rng(0)
    images = rng.normal(size=(global_b, 28, 28, 3)).astype(np.float32)
    labels = rng.integers(0, 8, size=(global_b,)).astype(np.int32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images[:2]))
    ocfg = OptimConfig(base_lr=1e-3, warmup_epochs=0, epochs=1,
                       steps_per_epoch=4, global_batch_size=global_b)
    tx = make_optimizer(ocfg, variables["params"])
    state = TrainState.create(variables["params"], tx, use_ema=True)

    sched = SupernetSchedules(net, space, example_per_arch=2,
                              num_warmup_epochs=0, arch_mode="multi")
    tcfg = TrainConfig(num_classes=8, mixup_mode="token", patch_len=2,
                       ema_decay=0.99996)
    step = make_train_step(model, tx, tcfg, schedule=cosine_schedule(ocfg),
                           donate=False, counts_unpack=sched.unpack)
    eval_step = make_eval_step(model)

    # process-local slice of the global batch (what the sharded sampler
    # would hand this host)
    p, n = jax.process_index(), jax.process_count()
    lo, hi = p * global_b // n, (p + 1) * global_b // n
    state = replicate(mesh, state)
    imgs, lbls = shard_batch(mesh, (images[lo:hi], labels[lo:hi]))

    losses = []
    arch_rng = np.random.default_rng(1)
    for _ in range(3):
        counts = sched.sample_packed(arch_rng, global_b)
        state, metrics = step(state, imgs, lbls, counts,
                              jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))

    em = eval_step(state.params, None, imgs, lbls, sched.full_counts())
    eval_metrics = {k: float(v) for k, v in em.items()}
    return {"losses": losses, "eval": eval_metrics}


def main():
    mode, rank, nproc, port, outdir = sys.argv[1:6]
    rank, nproc = int(rank), int(nproc)

    os.environ["JAX_PLATFORMS"] = "cpu"
    per_proc = 8 // nproc  # 8-device global mesh regardless of process count
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={per_proc}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=rank)

    if mode == "lib":
        result = run_lib_scenario()
    elif mode in ("cli", "cli-evo"):
        sys.path.insert(0, _HERE)
        import test_cli_e2e  # noqa: F401  (registers the tiny test model/space)
        import argparse

        if mode == "cli":
            from vit_search_tpu.cli.train import get_args_parser
            from vit_search_tpu.cli.train import main as cli_main
        else:
            from vit_search_tpu.cli.evo_search import get_args_parser
            from vit_search_tpu.cli.evo_search import main as cli_main
        parser = argparse.ArgumentParser(parents=[get_args_parser()])
        result = cli_main(parser.parse_args(sys.argv[6:]))
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    with open(os.path.join(outdir, f"result_rank{rank}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
