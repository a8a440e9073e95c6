"""Multi-host (TPU pod) launcher with preemption-safe restart semantics.

Plays the role of the reference SLURM/submitit launcher
(run_with_submitit.py): bring up the process group, run training, and on
preemption make sure the job can requeue with ``--resume``.

TPU-native differences:
- the "cluster" is a TPU pod; process coordinates come from the TPU
  runtime environment (or explicit ``--coordinator-address/--num-processes/
  --process-id`` flags), and ``jax.distributed.initialize`` replaces the
  SLURM rendezvous (reference run_with_submitit.py:74-83),
- preemption is a SIGTERM from the scheduler: the handler asks the train
  loop to checkpoint and exit; relaunching the same command with
  ``--resume auto`` continues (reference ``Trainer.checkpoint`` requeue,
  run_with_submitit.py:62-72).

Usage: ``python -m vit_search_tpu.cli.launch <train args...>`` on every
host (GKE/GCE TPU VMs run the same command per host).
"""

from __future__ import annotations

import argparse
import os
import sys


def pod_process_env() -> dict:
    """Infer process coordinates from common TPU pod environments."""
    env = os.environ
    coords = {}
    if "MEGASCALE_COORDINATOR_ADDRESS" in env:
        coords["coordinator_address"] = env["MEGASCALE_COORDINATOR_ADDRESS"]
    for key in ("MEGASCALE_NUM_SLICES", "TPU_WORKER_COUNT"):
        if key in env:
            coords["num_processes"] = int(env[key])
            break
    for key in ("MEGASCALE_SLICE_ID", "TPU_WORKER_ID"):
        if key in env:
            coords["process_id"] = int(env[key])
            break
    return coords


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser("vit-search-tpu pod launcher")
    parser.add_argument("--coordinator-address", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    launcher_args, train_argv = parser.parse_known_args(argv)

    coords = pod_process_env()
    if launcher_args.coordinator_address:
        coords["coordinator_address"] = launcher_args.coordinator_address
    if launcher_args.num_processes is not None:
        coords["num_processes"] = launcher_args.num_processes
    if launcher_args.process_id is not None:
        coords["process_id"] = launcher_args.process_id

    from ..parallel import init_distributed

    init_distributed(coords.get("coordinator_address"),
                     coords.get("num_processes"), coords.get("process_id"))

    from .train import get_args_parser, main as train_main

    train_parser = argparse.ArgumentParser(parents=[get_args_parser()])
    args = train_parser.parse_args(train_argv)
    if not args.resume:
        args.resume = "auto"  # preemption requeue: continue if a ckpt exists
        try:
            train_main(args)
            return 0
        except FileNotFoundError:
            args.resume = ""
    train_main(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
