"""Evolutionary-search driver (reference ``evo_search.py`` parity).

Flag surface matches the reference (evo_search.py:63-135: population 500,
20 iterations, 75 parents, 75 mutations + 75 crossovers, mutate prob 0.3,
``--constraint-value`` in MACs).  Per-iteration population pickles/txt dumps
and a running ``summary.txt`` of the best individual are written like the
reference (evo_search.py:289-314), plus the ``write_results`` CSV
(evo_search.py:143-157).

The scoring loop is the TPU redesign: candidates are evaluated as masked
batched supernet inference (search/batched_eval.py) instead of
per-candidate model rebuilds.
"""

from __future__ import annotations

import argparse
import csv
import os
import pickle
import time


def get_args_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("vit-search-tpu evolutionary search",
                                     add_help=False)
    parser.add_argument("--data-path", required=True, type=str)
    parser.add_argument("--data-set", default="IMNET", type=str)
    parser.add_argument("--val-bs", default=256, type=int)
    parser.add_argument("--num_workers", default=10, type=int)
    parser.add_argument("--input-size", default=224, type=int)
    parser.add_argument("--seed", default=0, type=int)

    parser.add_argument("--model", default="flexible_vit_sr_patch14_224_patch_output",
                        type=str)
    parser.add_argument("--model-path", required=True, type=str,
                        help="trained supernet checkpoint directory")
    parser.add_argument("--network-def", required=True, type=str,
                        help="largest network_def (supernet architecture)")
    parser.add_argument("--search-space", required=True, type=str)

    parser.add_argument("--constraint-value", required=True, type=float,
                        help="MAC constraint")
    parser.add_argument("--search-iter", default=20, type=int)
    parser.add_argument("--init-popu-size", default=500, type=int)
    parser.add_argument("--parent-size", default=75, type=int)
    parser.add_argument("--mutate-size", default=75, type=int)
    parser.add_argument("--mutate-prob", default=0.3, type=float)

    parser.add_argument("--patch-size", default=None, type=int,
                        help="stem patch size (default: inferred from model name)")
    parser.add_argument("--arch-batch", default=8, type=int,
                        help="candidates scored per compiled batch")
    parser.add_argument("--score-head", default="auto",
                        choices=["auto", "cls", "dst", "joint"],
                        help="fitness logits; 'auto' mirrors the reference "
                             "(dst_acc1 for distill supernets, acc1 "
                             "otherwise, evo_search.py:280-285)")
    parser.add_argument("--output_dir", default="")
    parser.add_argument("--print-freq", default=100, type=int)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no-bf16", action="store_false", dest="bf16")
    parser.add_argument("--max-eval-batches", default=None, type=int,
                        help="truncate sub-val evaluation (smoke tests)")
    return parser


def write_results(path: str, history) -> None:
    """CSV of (score, mac-estimated?) per individual (evo_search.py:143-157)."""
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["rank", "score", "network_def"])
        for rank, ind in enumerate(history):
            writer.writerow([rank, ind.score, repr(ind.network_def)])


def main(args) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .. import arch, data, models, parallel, train, utils
    from ..models.supernet import SupernetSchedules
    from ..search import PopulationEvolver
    from ..search.batched_eval import BatchedSupernetEvaluator

    mesh = parallel.create_mesh()
    is_main = parallel.is_main_process()
    logger = utils.file_logger(args.output_dir or None, is_master=is_main)
    logger.info(str(args))
    np.random.seed(args.seed)

    network_def = arch.parse_network_def(args.network_def)
    space = arch.get_space(args.search_space)

    # sub-val loader (reference uses the held-out 25 img/class split);
    # sharded per host like the reference's DDP eval, batches sharded over
    # the device mesh inside the evaluator
    eval_transform = data.EvalTransform(size=args.input_size)
    dataset_val = data.build_dataset(False, data_set=args.data_set,
                                     data_path=args.data_path,
                                     transform=eval_transform, use_holdout=True)
    sampler = data.ShardedSampler(len(dataset_val), parallel.process_count(),
                                  jax.process_index(), shuffle=False)
    # All-sample padded eval: every holdout image scores exactly once for
    # every candidate (reference datasets.py:154-184 pads so all ranks see
    # equal batches and all images are scored; our validity mask
    # additionally de-duplicates the padding rows)
    loader = data.PaddedEvalLoader(
        data.DataLoader(dataset_val, sampler, args.val_bs,
                        num_workers=args.num_workers, drop_last=False),
        sampler.num_valid_samples)
    if args.max_eval_batches:
        full_loader = loader

        class _Truncated:
            def __iter__(self):
                for i, b in enumerate(full_loader):
                    if i >= args.max_eval_batches:
                        break
                    yield b

        loader = _Truncated()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = models.create_model(args.model, network_def=network_def,
                                num_classes=dataset_val.num_classes,
                                img_size=args.input_size, dtype=dtype)

    raw = train.restore_raw(args.model_path)
    params = raw["params"]
    batch_stats = raw.get("batch_stats")

    schedules = SupernetSchedules(network_def, space, example_per_arch=1,
                                  num_warmup_epochs=0, arch_mode="multi")
    evaluator = BatchedSupernetEvaluator(model, params, batch_stats, schedules,
                                         loader, arch_batch=args.arch_batch,
                                         score_head=args.score_head, mesh=mesh)
    logger.info(f"Scoring candidates by '{evaluator.score_head}' accuracy")

    patch_size = args.patch_size or (14 if "patch14" in args.model else 16)
    estimator = arch.ComputationEstimator(
        distill="distill" in args.model, input_resolution=args.input_size,
        patch_size=patch_size)
    evolver = PopulationEvolver(network_def, space, args.constraint_value,
                                estimator, seed=args.seed)

    if args.output_dir and is_main:
        os.makedirs(args.output_dir, exist_ok=True)

    best_per_iter = []
    t_search = time.time()
    for search_iter in range(args.search_iter):
        t_iter = time.time()
        if search_iter == 0:
            evolver.random_sample(args.init_popu_size)
        else:
            evolver.evolve_sample(parent_size=args.parent_size,
                                  mutate_prob=args.mutate_prob,
                                  mutate_size=args.mutate_size)

        defs = [ind.network_def for ind in evolver.popu]
        scores = evaluator.score(defs, progress=logger.info)
        for ind, score in zip(evolver.popu, scores):
            ind.score = float(score)

        if args.output_dir and is_main:
            with open(os.path.join(args.output_dir,
                                   f"iter@{search_iter}_popu.pickle"), "wb") as f:
                pickle.dump([(ind.network_def, ind.score)
                             for ind in evolver.popu], f)
            with open(os.path.join(args.output_dir,
                                   f"iter@{search_iter}_popu.txt"), "w") as f:
                for ind in evolver.popu:
                    f.write(f"{ind}\n")

        evolver.update_history()
        evolver.sort_history()
        best = evolver.best()
        best_per_iter.append(best.score)
        logger.info(f"Iter {search_iter}: best acc1 = {best.score:.3f}, "
                    f"time = {time.time() - t_iter:.1f}s")
        if args.output_dir and is_main:
            with open(os.path.join(args.output_dir, "summary.txt"), "a") as f:
                f.write(f"iter {search_iter}: score={best.score:.4f} "
                        f"mac={estimator(best.network_def)} "
                        f"def={best.network_def}\n")
            write_results(os.path.join(args.output_dir, "history.csv"),
                          evolver.history_popu)

    logger.info(f"Search time: {time.time() - t_search:.1f}s")
    best = evolver.best()
    logger.info(f"Best: {best}")
    return {"best_network_def": best.network_def, "best_score": best.score,
            "best_per_iter": best_per_iter}


if __name__ == "__main__":
    parser = argparse.ArgumentParser("vit-search-tpu evo search",
                                     parents=[get_args_parser()])
    main(parser.parse_args())
