"""Search-operator and evolver tests.

The end-to-end test drives the full search loop with the synthetic accuracy
predictor pattern from the reference's only executable integration test
(search_utils/evolver.py:119-236) — no model or data needed.
"""

import math

import numpy as np
import pytest

from vit_search_tpu.arch import ComputationEstimator, presets, spaces
from vit_search_tpu.arch import network_def as nd
from vit_search_tpu.search import (PopulationEvolver, gen_random_network_def,
                                   generators, mutate_network_def,
                                   crossover_network_def)

LARGEST = presets.SUPERNET_SR_TINY
SPACE = spaces.get_space("sr_tiny")
EST = ComputationEstimator(distill=True, input_resolution=224, patch_size=14)
CONSTRAINT = EST(LARGEST) * 0.37
LO = generators.RESOURCE_LOWER_BOUND * CONSTRAINT


def _check_in_space(net):
    nd.validate(net)
    for i, block in enumerate(net):
        keep = SPACE[i]
        btype = nd.block_type(block)
        if btype in nd.EMBED_TYPES:
            assert block[1] in [int(x) for x in keep]
        elif btype == nd.SPATIAL_REDUCTION:
            assert block[2] in [int(x) for x in keep]
        elif btype == nd.TRANSFORMER:
            tdef = nd.transformer_def(block)
            if tdef.exists:
                assert tdef.attn_width in [int(x) for x in keep["attn"]]
                assert tdef.ffn_hidden in [int(x) for x in keep["mlp"]]


def test_random_samples_land_in_band():
    rng = np.random.default_rng(0)
    for _ in range(5):
        net = gen_random_network_def(LARGEST, SPACE, CONSTRAINT, EST, rng=rng)
        assert LO <= EST(net) <= CONSTRAINT
        _check_in_space(net)


def test_mutation_stays_in_space_and_band():
    rng = np.random.default_rng(1)
    parent = gen_random_network_def(LARGEST, SPACE, CONSTRAINT, EST, rng=rng)
    child = mutate_network_def(parent, SPACE, 0.3, CONSTRAINT, EST, rng=rng)
    assert LO <= EST(child) <= CONSTRAINT
    _check_in_space(child)


def test_crossover_mixes_parents():
    rng = np.random.default_rng(2)
    a = gen_random_network_def(LARGEST, SPACE, CONSTRAINT, EST, rng=rng)
    b = gen_random_network_def(LARGEST, SPACE, CONSTRAINT, EST, rng=rng)
    c = crossover_network_def(a, b, SPACE, CONSTRAINT, EST, rng=rng)
    assert LO <= EST(c) <= CONSTRAINT
    _check_in_space(c)
    # every gene comes from one of the parents
    for i, block in enumerate(c):
        if nd.block_type(block) == nd.TRANSFORMER:
            assert block[1][1] in (a[i][1][1], b[i][1][1])
            assert block[2][1] in (a[i][2][1], b[i][2][1])


def test_prune_only_moves_down():
    rng = np.random.default_rng(3)
    net = nd.to_mutable(LARGEST)
    before = EST(net)
    for _ in range(10):
        net = generators.prune_random_one(net, SPACE, rng=rng)
        after = EST(net)
        assert after <= before
        before = after


def test_determinism_with_seed():
    a = gen_random_network_def(LARGEST, SPACE, CONSTRAINT, EST,
                               rng=np.random.default_rng(42))
    b = gen_random_network_def(LARGEST, SPACE, CONSTRAINT, EST,
                               rng=np.random.default_rng(42))
    assert a == b


def _synthetic_accuracy(largest):
    """Closed-form score favouring wide/deep nets (reference evolver self-test)."""
    def compute_score(net):
        score = 0.0
        for i, block in enumerate(net):
            depth_factor = (11.0 + i) / 8.0
            if nd.block_type(block) == nd.TRANSFORMER and block[3]:
                embed = block[1][0]
                score += block[1][1] * block[1][2] * depth_factor * 2 * math.sqrt(embed)
                score += block[2][1] * depth_factor * math.sqrt(embed)
        return score

    max_score = compute_score(largest)
    return lambda net: compute_score(net) / max_score


def test_full_search_loop_with_synthetic_predictor():
    predictor = _synthetic_accuracy(LARGEST)
    evolver = PopulationEvolver(LARGEST, SPACE, CONSTRAINT, EST, seed=0)

    best_per_iter = []
    for it in range(4):
        if it == 0:
            evolver.random_sample(num_samples=24)
        else:
            evolver.evolve_sample(parent_size=10, mutate_prob=0.3, mutate_size=8)
        assert len(evolver.popu) in (24, 16)
        # no duplicates within generation or against history
        defs = [ind.network_def for ind in evolver.popu]
        assert len(set(defs)) == len(defs)
        for ind in evolver.popu:
            ind.score = predictor(ind.network_def)
        evolver.update_history()
        evolver.sort_history()
        best_per_iter.append(evolver.best().score)

    # search makes monotone progress on the synthetic landscape
    assert best_per_iter[-1] >= best_per_iter[0]
    assert all(LO <= EST(i.network_def) <= CONSTRAINT for i in evolver.history_popu)


def test_evolver_guards():
    evolver = PopulationEvolver(LARGEST, SPACE, CONSTRAINT, EST, seed=0)
    with pytest.raises(RuntimeError):
        evolver.evolve_sample(parent_size=2, mutate_prob=0.3, mutate_size=2)
    evolver.random_sample(4)
    with pytest.raises(RuntimeError):
        evolver.evolve_sample(parent_size=2, mutate_prob=0.3, mutate_size=2)
    evolver.update_history()
    with pytest.raises(ValueError):
        evolver.evolve_sample(parent_size=100, mutate_prob=0.3, mutate_size=2)


def test_python_backend_forced():
    evolver = PopulationEvolver(LARGEST, SPACE, CONSTRAINT, EST, seed=0,
                                backend="python")
    assert evolver.native is None
    evolver.random_sample(3)
    for ind in evolver.popu:
        assert LO <= EST(ind.network_def) <= CONSTRAINT


def test_native_backend_auto_engages():
    from vit_search_tpu import native as native_mod
    if not native_mod.available():
        return
    evolver = PopulationEvolver(LARGEST, SPACE, CONSTRAINT, EST, seed=0)
    assert evolver.native is not None


# --- batched candidate scoring ----------------------------------------------------

def test_batched_eval_score_heads():
    """Distill supernets are scored by the dst head like the reference
    (evo_search.py:280-285); each head's scores match direct per-candidate
    masked forwards."""
    import jax
    import jax.numpy as jnp

    from vit_search_tpu.models import (SupernetSchedules, VisionTransformerSR,
                                       build_arch_masks)
    from vit_search_tpu.search.batched_eval import BatchedSupernetEvaluator

    super_def = ((0, 16),
                 (1, (16, 4, 4), (16, 32), 1),
                 (1, (16, 4, 4), (16, 32), 1),
                 (3, 16, 32),
                 (1, (32, 4, 8), (32, 64), 1),
                 (2, 32, 10))
    sub_def = ((0, 12),
               (1, (12, 2, 4), (12, 16), 1),
               (1, (12, 2, 4), (12, 16), 0),
               (3, 12, 24),
               (1, (24, 2, 8), (24, 32), 1),
               (2, 24, 10))
    space = [np.array([16, 12, 8]),
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
              "layer": None},
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
              "layer": np.array([16, 0])},
             np.array([32, 24]),
             {"attn": np.array([32, 16]), "mlp": np.array([64, 32]),
              "layer": None},
             None]

    model = VisionTransformerSR(network_def=super_def, img_size=28,
                                patch_size=7, num_classes=10,
                                distill_token=True)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(6, 28, 28, 3)).astype(np.float32)
    labels = rng.integers(0, 10, size=(6,)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
    params = variables["params"]
    loader = [(images, labels)]

    schedules = SupernetSchedules(super_def, space, example_per_arch=1,
                                  num_warmup_epochs=0, arch_mode="multi")
    defs = [super_def, sub_def]

    # direct per-candidate scoring (the contract the tiled step must meet)
    def direct(head):
        out = []
        for d in defs:
            counts = schedules.counts_for_subnets([d])
            per_ex = {"embed": None if counts["embed"] is None
                      else np.repeat(counts["embed"], len(images)),
                      "slots": {s: {k: np.repeat(v, len(images))
                                    for k, v in site.items()}
                                for s, site in counts["slots"].items()}}
            masks = build_arch_masks(jax.tree.map(jnp.asarray, per_ex),
                                     super_def, len(images))
            cls, dst = model.apply({"params": params}, jnp.asarray(images),
                                   masks, deterministic=True)
            pred = {"cls": cls, "dst": dst,
                    "joint": (jax.nn.softmax(cls.astype(jnp.float32), -1)
                              + jax.nn.softmax(dst.astype(jnp.float32), -1))
                    }[head]
            acc = float((jnp.argmax(pred, -1) == jnp.asarray(labels)).mean())
            out.append(acc * 100.0)
        return out

    auto = BatchedSupernetEvaluator(model, params, None, schedules, loader,
                                    arch_batch=2)
    assert auto.score_head == "dst"  # distill supernet -> dst, like reference
    np.testing.assert_allclose(auto.score(defs), direct("dst"), atol=1e-4)
    for head in ("cls", "joint"):
        ev = BatchedSupernetEvaluator(model, params, None, schedules, loader,
                                      arch_batch=2, score_head=head)
        np.testing.assert_allclose(ev.score(defs), direct(head), atol=1e-4)

    # non-distill supernets auto-select cls and reject dst scoring
    plain = VisionTransformerSR(network_def=super_def, img_size=28,
                                patch_size=7, num_classes=10)
    pvars = plain.init(jax.random.PRNGKey(0), jnp.asarray(images))
    ev = BatchedSupernetEvaluator(plain, pvars["params"], None, schedules,
                                  loader, arch_batch=2)
    assert ev.score_head == "cls"
    with pytest.raises(ValueError):
        BatchedSupernetEvaluator(plain, pvars["params"], None, schedules,
                                 loader, arch_batch=2, score_head="dst")


def test_batched_eval_normalizes_uint8_like_engine():
    """The production sub-val loader ships uint8 batches (data/loader.py;
    normalization is device-side by design).  The tiled scoring step must
    apply the engine's ImageNet normalization to them — the reference
    normalizes search-eval batches in its GPU prefetch loader
    (datasets.py:170-184 via evo_search.py:189-196).

    A probe model whose prediction is the sign of the per-example pixel
    mean discriminates the scales directly (a real supernet is almost
    scale-invariant through its LayerNorms, which is exactly how a
    missing normalization could hide): pixels at constant 100 have a
    positive raw mean but a negative ImageNet-normalized mean
    ((100/255 - 0.456) / std < 0 for every channel)."""
    import jax.numpy as jnp

    from vit_search_tpu.models import SupernetSchedules
    from vit_search_tpu.search.batched_eval import make_tiled_correct_step

    super_def = ((0, 16),
                 (1, (16, 4, 4), (16, 32), 1),
                 (2, 16, 2))
    space = [np.array([16, 8]),
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
              "layer": None},
             None]

    class ProbeModel:
        network_def = super_def
        distill_token = False

        def apply(self, variables, images, masks, deterministic=True):
            per_ex = images.astype(jnp.float32).mean(axis=(1, 2, 3))
            # class 1 wins iff the per-example mean is negative
            return jnp.stack([per_ex, jnp.zeros_like(per_ex)], axis=-1)

    schedules = SupernetSchedules(super_def, space, example_per_arch=1,
                                  num_warmup_epochs=0, arch_mode="multi")
    counts = schedules.counts_for_subnets([super_def])
    counts = {"embed": jnp.asarray(counts["embed"]),
              "slots": {s: {k: jnp.asarray(v) for k, v in site.items()}
                        for s, site in counts["slots"].items()}}

    images_u8 = np.full((6, 28, 28, 3), 100, np.uint8)
    labels = np.ones(6, np.int32)   # correct iff normalization happened
    valid = np.ones(6, np.float32)

    step = make_tiled_correct_step(ProbeModel())
    correct, total = step(None, None, jnp.asarray(images_u8),
                          jnp.asarray(labels), jnp.asarray(valid), counts)
    assert float(total) == 6.0
    assert float(correct[0]) == 6.0  # uint8 batch was ImageNet-normalized

    # already-float batches (the unit-test convention) pass through unscaled
    images_f = np.full((6, 28, 28, 3), -1.0, np.float32)
    correct_f, _ = step(None, None, jnp.asarray(images_f),
                        jnp.asarray(labels), jnp.asarray(valid), counts)
    assert float(correct_f[0]) == 6.0
    images_f_pos = np.full((6, 28, 28, 3), 100.0, np.float32)
    correct_p, _ = step(None, None, jnp.asarray(images_f_pos),
                        jnp.asarray(labels), jnp.asarray(valid), counts)
    assert float(correct_p[0]) == 0.0


def test_batched_eval_sharded_over_mesh_matches_single_device():
    """Candidate scoring with sub-val batches sharded over the 8-device CPU
    mesh returns the same scores as unsharded scoring (reference
    counterpart: DDP candidate eval, evo_search.py:269-287)."""
    import jax
    import jax.numpy as jnp

    from vit_search_tpu.models import SupernetSchedules, VisionTransformerSR
    from vit_search_tpu.parallel import create_mesh
    from vit_search_tpu.search.batched_eval import BatchedSupernetEvaluator

    super_def = ((0, 16),
                 (1, (16, 4, 4), (16, 32), 1),
                 (3, 16, 32),
                 (1, (32, 4, 8), (32, 64), 1),
                 (2, 32, 10))
    space = [np.array([16, 8]),
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
              "layer": None},
             np.array([32, 16]),
             {"attn": np.array([32, 16]), "mlp": np.array([64, 32]),
              "layer": None},
             None]
    sub_def = ((0, 8),
               (1, (8, 2, 4), (8, 16), 1),
               (3, 8, 16),
               (1, (16, 2, 8), (16, 32), 1),
               (2, 16, 10))

    model = VisionTransformerSR(network_def=super_def, img_size=28,
                                patch_size=7, num_classes=10)
    rng = np.random.default_rng(0)
    batches = [(rng.normal(size=(8, 28, 28, 3)).astype(np.float32),
                rng.integers(0, 10, size=(8,)).astype(np.int32))
               for _ in range(3)]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batches[0][0]))
    params = variables["params"]
    schedules = SupernetSchedules(super_def, space, example_per_arch=1,
                                  num_warmup_epochs=0, arch_mode="multi")
    defs = [super_def, sub_def]

    plain = BatchedSupernetEvaluator(model, params, None, schedules, batches,
                                     arch_batch=2)
    mesh = create_mesh()
    sharded = BatchedSupernetEvaluator(model, params, None, schedules,
                                       batches, arch_batch=2, mesh=mesh)
    np.testing.assert_allclose(sharded.score(defs), plain.score(defs),
                               rtol=1e-5, atol=1e-4)


def test_batched_eval_padded_all_sample():
    """PaddedEvalLoader + validity weighting scores every image exactly
    once: a non-divisible sub-val (10 imgs, bs 4) matches a direct
    all-sample masked eval (reference all-sample padded search eval,
    datasets.py:154-184 / evo_search.py:189-196)."""
    import jax
    import jax.numpy as jnp

    from vit_search_tpu.data import DataLoader, PaddedEvalLoader, ShardedSampler
    from vit_search_tpu.data.datasets import VisionDataset
    from vit_search_tpu.models import (SupernetSchedules, VisionTransformerSR,
                                       build_arch_masks)
    from vit_search_tpu.search.batched_eval import BatchedSupernetEvaluator

    super_def = ((0, 16),
                 (1, (16, 4, 4), (16, 32), 1),
                 (3, 16, 32),
                 (1, (32, 4, 8), (32, 64), 1),
                 (2, 32, 10))
    space = [np.array([16, 8]),
             {"attn": np.array([16, 8]), "mlp": np.array([32, 16]),
              "layer": None},
             np.array([32, 16]),
             {"attn": np.array([32, 16]), "mlp": np.array([64, 32]),
              "layer": None},
             None]
    sub_def = ((0, 8),
               (1, (8, 2, 4), (8, 16), 1),
               (3, 8, 16),
               (1, (16, 2, 8), (16, 32), 1),
               (2, 16, 10))

    rng = np.random.default_rng(1)
    all_images = rng.normal(size=(10, 28, 28, 3)).astype(np.float32)
    all_labels = rng.integers(0, 10, size=(10,)).astype(np.int32)

    class ArrayDataset(VisionDataset):
        num_classes = 10

        def __len__(self):
            return len(all_images)

        def load(self, index, rng):
            return all_images[index], int(all_labels[index])

    model = VisionTransformerSR(network_def=super_def, img_size=28,
                                patch_size=7, num_classes=10)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(all_images))["params"]
    schedules = SupernetSchedules(super_def, space, example_per_arch=1,
                                  num_warmup_epochs=0, arch_mode="multi")
    defs = [super_def, sub_def]

    sampler = ShardedSampler(10, 1, 0, shuffle=False)
    assert sampler.num_valid_samples == 10
    loader = PaddedEvalLoader(
        DataLoader(ArrayDataset(), sampler, 4, num_workers=1,
                   drop_last=False), sampler.num_valid_samples)
    batches = list(loader)
    assert [b[0].shape[0] for b in batches] == [4, 4, 4]  # static shapes
    assert [int(b[2].sum()) for b in batches] == [4, 4, 2]  # tail dedup

    ev = BatchedSupernetEvaluator(model, params, None, schedules, loader,
                                  arch_batch=2)

    def direct(d):
        counts = schedules.counts_for_subnets([d])
        per_ex = {"embed": None if counts["embed"] is None
                  else np.repeat(counts["embed"], 10),
                  "slots": {s: {k: np.repeat(v, 10)
                                for k, v in site.items()}
                            for s, site in counts["slots"].items()}}
        masks = build_arch_masks(jax.tree.map(jnp.asarray, per_ex),
                                 super_def, 10)
        pred = model.apply({"params": params}, jnp.asarray(all_images),
                           masks, deterministic=True)
        return float((jnp.argmax(pred, -1)
                      == jnp.asarray(all_labels)).mean()) * 100.0

    np.testing.assert_allclose(ev.score(defs), [direct(d) for d in defs],
                               atol=1e-4)


def test_sharded_sampler_valid_counts_cover_dataset_once():
    """Across ranks, num_valid_samples partitions the dataset exactly."""
    from vit_search_tpu.data import ShardedSampler

    for n, reps in [(10, 4), (9, 2), (7, 3), (8, 1), (3, 4)]:
        samplers = [ShardedSampler(n, reps, r, shuffle=False)
                    for r in range(reps)]
        assert sum(s.num_valid_samples for s in samplers) == n
        for s in samplers:
            shard = list(iter(s))
            # the leading num_valid_samples entries are the real images
            start = s.rank * s.num_samples
            expect = list(range(start, min(start + s.num_samples, n)))
            assert shard[:s.num_valid_samples] == expect
