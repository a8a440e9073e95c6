"""Data-pipeline tests: transforms, samplers, loader, subsets, device mixing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vit_search_tpu.data import (DataLoader, EvalTransform, ImageFolderDataset,
                                 RepeatedAugmentSampler, ShardedSampler,
                                 SyntheticDataset, TrainTransform,
                                 build_dataset, build_subsets, mixup,
                                 random_erasing)


def _make_imagefolder(root, classes=3, per_class=8, size=32):
    rng = np.random.default_rng(0)
    for c in range(classes):
        d = root / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(root)


# --- transforms -----------------------------------------------------------------

def test_train_transform_shapes_and_determinism():
    t = TrainTransform(size=24)
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, size=(48, 64, 3), dtype=np.uint8))
    out1 = t(img, np.random.default_rng(5))
    out2 = t(img, np.random.default_rng(5))
    out3 = t(img, np.random.default_rng(6))
    assert out1.shape == (24, 24, 3) and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)   # seeded => deterministic
    assert not np.array_equal(out1, out3)        # different seed => different aug


def test_eval_transform_center_crop():
    t = EvalTransform(size=24)
    img = Image.fromarray(np.zeros((100, 60, 3), dtype=np.uint8))
    out = t(img)
    assert out.shape == (24, 24, 3)


def test_rand_augment_all_ops_run():
    from vit_search_tpu.data.transforms import RandAugment
    ra = RandAugment()
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, size=(24, 24, 3), dtype=np.uint8))
    rng = np.random.default_rng(0)
    for op in ra.ops:
        out = op(img, 9.0, rng)
        assert out.size == img.size


def test_rand_augment_timm_level_mappings():
    """Goldens hand-derived from timm 0.3.2 auto_augment.py 'inc1'
    level->arg fns (timm itself is not installed; the reference drives
    these via create_transform('rand-m9-mstd0.5-inc1'), datasets.py)."""
    from vit_search_tpu.data.transforms import _RA_FILL, RandAugment

    # _posterize_increasing_level_to_arg: bits kept = 4 - int(4*level/10)
    assert RandAugment.posterize_bits(9.0) == 1
    assert RandAugment.posterize_bits(10.0) == 0
    assert RandAugment.posterize_bits(0.0) == 4
    assert RandAugment.posterize_bits(2.4) == 4
    assert RandAugment.posterize_bits(2.5) == 3
    # _solarize_increasing_level_to_arg: 256 - int(256*level/10)
    assert RandAugment.solarize_thresh(9.0) == 26   # int(230.4) = 230
    assert RandAugment.solarize_thresh(0.0) == 256
    assert RandAugment.solarize_thresh(5.0) == 128
    # _enhance_increasing_level_to_arg: 1 +/- 0.9*level/10
    assert RandAugment.enhance_factor(9.0, False) == pytest.approx(1.81)
    assert RandAugment.enhance_factor(9.0, True) == pytest.approx(0.19)
    # AugmentOp fill = round(255 * IMAGENET_MEAN), timm transforms_factory
    assert _RA_FILL == (124, 116, 104)

    # posterize at m9 keeps exactly 1 bit -> channel values in {0, 128}
    grad = Image.fromarray(
        np.tile(np.arange(256, dtype=np.uint8), (8, 1))[..., None].repeat(3, -1))
    ra = RandAugment()
    out = np.asarray(ra._posterize(grad, 9.0, np.random.default_rng(0)))
    assert set(np.unique(out)) == {0, 128}
    # bits >= 8 is a no-op (timm posterize guard; unreachable for 'inc1'
    # levels in [0, 10] but part of the op contract)
    assert RandAugment.posterize_bits(-10.0) == 8
    same = ra._posterize(grad, -10.0, np.random.default_rng(0))
    assert same is grad


def test_rand_augment_apply_probability():
    """timm AugmentOp applies each chosen layer with prob 0.5."""
    from vit_search_tpu.data.transforms import RandAugment

    img = Image.fromarray(np.full((8, 8, 3), 200, dtype=np.uint8))
    # force the invert op only, mstd 0 -> any application changes the image
    ra = RandAugment(num_ops=1, magnitude=9.0, mag_std=0.0)
    ra.ops = [ra._invert]
    rng = np.random.default_rng(0)
    changed = sum(
        not np.array_equal(np.asarray(ra(img, rng)), np.asarray(img))
        for _ in range(2000))
    assert 900 < changed < 1100  # ~Binomial(2000, 0.5)


# --- samplers -------------------------------------------------------------------

def test_repeated_augment_sampler_semantics():
    n, replicas = 1024, 4
    samplers = [RepeatedAugmentSampler(n, replicas, r, selected_round=256)
                for r in range(replicas)]
    for s in samplers:
        s.set_epoch(3)
    shards = [list(iter(s)) for s in samplers]
    # selected count: floor(1024/256*256/4) = 256 per rank
    assert all(len(sh) == 256 for sh in shards)
    # 3x repetition: across the *full* (untruncated) index space each index
    # appears 3 times; within the truncated selection duplicates exist
    all_selected = sum(shards, [])
    values, counts = np.unique(all_selected, return_counts=True)
    assert counts.max() <= 3
    # epoch reseeds
    samplers[0].set_epoch(4)
    assert list(iter(samplers[0])) != shards[0]


def test_sharded_sampler_partitions():
    n, replicas = 103, 4
    shards = []
    for r in range(replicas):
        s = ShardedSampler(n, replicas, r, shuffle=False)
        shards.append(list(iter(s)))
    assert all(len(sh) == 26 for sh in shards)  # padded equal length
    covered = set(sum(shards, []))
    assert covered == set(range(n))
    # ordered shards are contiguous
    assert shards[0] == list(range(26))


# --- datasets + loader -------------------------------------------------------------

def test_imagefolder_and_loader(tmp_path):
    root = _make_imagefolder(tmp_path / "train")
    ds = ImageFolderDataset(root, TrainTransform(size=16))
    assert len(ds) == 24 and ds.num_classes == 3
    sampler = ShardedSampler(len(ds), 1, 0, shuffle=True)
    loader = DataLoader(ds, sampler, batch_size=8, num_workers=2)
    batches = list(iter(loader))
    assert len(batches) == 3
    for images, labels in batches:
        assert images.shape == (8, 16, 16, 3) and images.dtype == np.uint8
        assert labels.shape == (8,) and labels.dtype == np.int32


def test_loader_drop_last_and_epoch(tmp_path):
    ds = SyntheticDataset(num_classes=4, length=10, img_size=8)
    sampler = ShardedSampler(len(ds), 1, 0, shuffle=True)
    loader = DataLoader(ds, sampler, batch_size=4, drop_last=False)
    assert len(loader) == 3
    batches = list(iter(loader))
    assert batches[-1][0].shape[0] == 2  # tail kept

    loader.set_epoch(1)
    b1 = np.concatenate([b[1] for b in iter(loader)])
    loader.set_epoch(2)
    b2 = np.concatenate([b[1] for b in iter(loader)])
    assert not np.array_equal(b1, b2)


def test_build_dataset_synthetic_and_holdout_dispatch(tmp_path):
    ds = build_dataset(True, data_set="SYNTHETIC:4:16:8", data_path="",
                       transform=None)
    assert ds.num_classes == 4 and len(ds) == 16
    img, label = ds.load(3, np.random.default_rng(0))
    assert img.shape == (8, 8, 3) and label == 3

    root = tmp_path
    _make_imagefolder(root / "train")
    build_subsets(str(root), per_class=2, seed=0)
    sub_train = build_dataset(True, data_set="IMNET", data_path=str(root),
                              transform=EvalTransform(16), use_holdout=True)
    sub_val = build_dataset(False, data_set="IMNET", data_path=str(root),
                            transform=EvalTransform(16), use_holdout=True)
    assert len(sub_val) == 3 * 2
    assert len(sub_train) == 24 - 6
    # manifest pins the split
    assert os.path.exists(root / "sub_val_files.json")
    # no sample lives in both splits
    train_names = {os.path.basename(p) + c for c in [""] for p, _ in sub_train.samples}
    val_names = {p for p, _ in sub_val.samples}
    assert not ({os.path.basename(p) for p, _ in sub_train.samples}
                & {os.path.basename(p) for p, _ in sub_val.samples}
                & set())  # same basenames may repeat across classes; check paths
    assert not (set(p for p, _ in sub_train.samples) & val_names)


def test_reference_holdout_pickle_import(tmp_path):
    """A sub_val_files.pickle in the reference's format (dict of
    class -> file names, search_utils/build_subset.py:28-57) takes
    precedence over fresh seeded selection."""
    import json
    import pickle
    import subprocess
    import sys

    from vit_search_tpu.data import convert_reference_pickle

    root = tmp_path
    _make_imagefolder(root / "train")
    classes = sorted(d.name for d in os.scandir(root / "train"))
    # pin a specific 1-image/class holdout, deliberately NOT what seed 0
    # would pick (first file of each class, unsorted-pickle order)
    pinned = {cls: [sorted(os.listdir(root / "train" / cls))[0]]
              for cls in classes}
    pkl = root / "sub_val_files.pickle"
    with open(pkl, "wb") as f:
        pickle.dump(pinned, f)

    manifest = build_subsets(str(root))  # auto-detects the pickle
    with open(manifest) as f:
        assert json.load(f) == pinned
    sub_val = build_dataset(False, data_set="IMNET", data_path=str(root),
                            transform=EvalTransform(16), use_holdout=True)
    assert sorted(os.path.basename(p) for p, _ in sub_val.samples) == sorted(
        n for names in pinned.values() for n in names)

    # validation mirrors reference build_subset.py:64-70
    with pytest.raises(ValueError):
        convert_reference_pickle(str(pkl), expect_classes=1000)
    with pytest.raises(ValueError):
        convert_reference_pickle(str(pkl), expect_per_class=25)
    assert convert_reference_pickle(
        str(pkl), expect_classes=len(classes), expect_per_class=1) == pinned

    # module CLI --convert-only path
    out = root / "converted.json"
    subprocess.run([sys.executable, "-m", "vit_search_tpu.data.subset",
                    str(root), "--convert-only",
                    "--reference-pickle", str(pkl),
                    "--manifest", str(out)],
                   check=True, capture_output=True)
    with open(out) as f:
        assert json.load(f) == pinned


# --- device-side mixing -----------------------------------------------------------

def test_switch_token_mix_targets_sum_to_one():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((8, 16, 16, 3))
    y = jnp.arange(8) % 4
    mixed, targets, patch_targets = mixup.switch_token_mix(
        rng, x, y, grid=4, num_classes=4, smoothing=0.1)
    assert mixed.shape == x.shape
    assert targets.shape == (8, 4)
    assert patch_targets.shape == (8, 16, 4)
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(patch_targets.sum(-1)), 1.0, atol=1e-5)


def test_patch_mixup_box_consistency():
    """Pixels and patch targets swap the same patch-aligned region."""
    rng = jax.random.PRNGKey(3)
    grid, patch = 4, 4
    b = 4
    # each image is a constant equal to its index
    x = jnp.broadcast_to(jnp.arange(b, dtype=jnp.float32)[:, None, None, None],
                         (b, grid * patch, grid * patch, 3))
    y = jnp.arange(b)
    mixed, targets, patch_targets = mixup.patch_mixup(
        rng, x, y, grid, num_classes=b, smoothing=0.0)
    mixed = np.asarray(mixed)
    pt = np.asarray(patch_targets).reshape(b, grid, grid, b)
    for i in range(b):
        for gy in range(grid):
            for gx in range(grid):
                pixel_val = mixed[i, gy * patch, gx * patch, 0]
                target_cls = pt[i, gy, gx].argmax()
                assert int(pixel_val) == int(target_cls)


def test_mixup_cutmix_lambda_consistency():
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((8, 16, 16, 3))
    y = jnp.arange(8) % 4
    mixed, targets = mixup.mixup_cutmix(rng, x, y, num_classes=4)
    assert mixed.shape == x.shape and targets.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)


def _per_image_values(b=8, size=16):
    """Batch where image i is the constant i -> mixes are readable."""
    x = jnp.broadcast_to(jnp.arange(b, dtype=jnp.float32)[:, None, None, None],
                         (b, size, size, 3))
    y = jnp.arange(b) % 4
    return x, y


def test_mixup_partner_is_flipped_batch():
    """timm Mixup mixes with x.flip(0): every pixel of mixed[i] is a convex
    combination of x[i] and x[b-1-i]."""
    x, y = _per_image_values()
    b = x.shape[0]
    for mode in ("batch", "elem", "pair"):
        mixed, targets = mixup.mixup_cutmix(
            jax.random.PRNGKey(3), x, y, num_classes=4, mode=mode)
        m = np.asarray(mixed)
        for i in range(b):
            j = b - 1 - i
            lo, hi = min(i, j), max(i, j)
            assert m[i].min() >= lo - 1e-5 and m[i].max() <= hi + 1e-5, (mode, i)
        np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)


def test_mixup_elem_mode_varies_per_example():
    """elem mode draws per-example lams; with constant-value images the
    realized per-example mix fractions should differ across the batch."""
    x, y = _per_image_values(b=16)
    mixed, _ = mixup.mixup_cutmix(jax.random.PRNGKey(0), x, y, num_classes=4,
                                  mode="elem", cutmix_alpha=0.0)  # pure mixup
    m = np.asarray(mixed)
    # recover lam_i from pixel value: m[i] = i*lam + (b-1-i)*(1-lam)
    lams = []
    b = x.shape[0]
    for i in range(b):
        j = b - 1 - i
        if i == j:
            continue
        lams.append((m[i].mean() - j) / (i - j))
    assert np.std(lams) > 1e-3  # not one shared lam
    # pair mode: lam_i == lam_{b-1-i}
    mixed_p, _ = mixup.mixup_cutmix(jax.random.PRNGKey(0), x, y, num_classes=4,
                                    mode="pair", cutmix_alpha=0.0)
    mp = np.asarray(mixed_p)
    for i in range(b // 2):
        j = b - 1 - i
        lam_i = (mp[i].mean() - j) / (i - j)
        lam_j = (mp[j].mean() - i) / (j - i)
        np.testing.assert_allclose(lam_i, lam_j, atol=1e-5)


def test_cutmix_minmax_box_bounds():
    """cutmix_minmax=(lo,hi): box dims are uniform fractions in [lo,hi) and
    the box lies fully inside the image (timm rand_bbox_minmax)."""
    x, y = _per_image_values(b=8, size=32)
    for trial in range(8):
        mixed, targets = mixup.mixup_cutmix(
            jax.random.PRNGKey(trial), x, y, num_classes=4,
            mixup_alpha=0.0, cutmix_alpha=0.0, cutmix_minmax=(0.25, 0.75),
            switch_prob=1.0)
        m = np.asarray(mixed)
        for i in range(8):
            j = 8 - 1 - i
            if i == j:
                continue
            patch = (m[i, :, :, 0] == j)
            frac = patch.mean()
            if frac == 0:
                continue  # prob gate can skip — but gate is 1.0 here
            ys, xs = np.where(patch)
            bh = ys.max() - ys.min() + 1
            bw = xs.max() - xs.min() + 1
            assert 32 * 0.25 <= bh < 32 * 0.75 + 1
            assert 32 * 0.25 <= bw < 32 * 0.75 + 1
            assert bh * bw == patch.sum()  # contiguous box fully inside


def test_mixup_mode_validation():
    x, y = _per_image_values()
    with pytest.raises(ValueError):
        mixup.mixup_cutmix(jax.random.PRNGKey(0), x, y, num_classes=4,
                           mode="banana")
    with pytest.raises(ValueError):
        mixup.mixup_cutmix(jax.random.PRNGKey(0), x[:7], y[:7], num_classes=4,
                           mode="pair")


def test_random_erasing_modes_and_count():
    from vit_search_tpu.data.erasing import random_erasing as erase

    rng = jax.random.PRNGKey(0)
    x = jnp.full((32, 16, 16, 3), 7.0)
    # const mode fills zeros
    out = np.asarray(erase(rng, x, prob=1.0, mode="const"))
    assert ((out == 0) | (out == 7)).all() and (out == 0).any()
    # rand mode: one color per region, constant across the region's pixels
    out = np.asarray(erase(rng, x, prob=1.0, mode="rand"))
    for img in out:
        vals = np.unique(img.reshape(-1, 3), axis=0)
        assert len(vals) <= 2  # original color + at most one region color
    # pixel mode: per-pixel noise -> many distinct values inside regions
    out = np.asarray(erase(rng, x, prob=1.0, mode="pixel"))
    assert len(np.unique(out)) > 32
    # count > 1 can erase more area (multiple regions); just check it runs
    # and produces >= as many disjoint regions on average
    one = np.asarray(erase(rng, x, prob=1.0, mode="const", count=1))
    many = np.asarray(erase(rng, x, prob=1.0, mode="const", count=4))
    assert (many == 0).mean() >= (one == 0).mean() * 0.8
    with pytest.raises(ValueError):
        erase(rng, x, prob=0.5, mode="banana")


def test_random_erasing_prob_bounds():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((64, 16, 16, 3))
    out = np.asarray(random_erasing(rng, x, prob=0.5))
    erased = (np.abs(out).reshape(64, -1).max(axis=1) > 0)
    assert 10 < erased.sum() < 55  # ~half the images got noise boxes
    out0 = np.asarray(random_erasing(rng, x, prob=0.0))
    np.testing.assert_array_equal(out0, 0.0)


def test_cifar100_dataset(tmp_path):
    import pickle

    d = tmp_path / "cifar-100-python"
    d.mkdir()
    rng = np.random.default_rng(0)
    n = 12
    blob = {"data": rng.integers(0, 255, size=(n, 3 * 32 * 32), dtype=np.uint8),
            "fine_labels": list(rng.integers(0, 100, size=n))}
    with open(d / "train", "wb") as f:
        pickle.dump(blob, f)
    ds = build_dataset(True, data_set="CIFAR", data_path=str(tmp_path),
                       transform=EvalTransform(16))
    assert len(ds) == n and ds.num_classes == 100
    img, label = ds.load(0, np.random.default_rng(0))
    assert img.shape == (16, 16, 3)
    assert label == blob["fine_labels"][0]


def test_inat_dataset(tmp_path):
    import json

    rng = np.random.default_rng(0)
    images, annos = [], []
    (tmp_path / "imgs").mkdir()
    for i in range(6):
        name = f"imgs/{i}.jpg"
        arr = rng.integers(0, 255, size=(20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / name)
        images.append({"id": i, "file_name": name})
        annos.append({"image_id": i, "category_id": i % 3})
    categories = [{"name": f"species_{c}", "genus": f"genus_{c % 2}"}
                  for c in range(3)]
    with open(tmp_path / "train2018.json", "w") as f:
        json.dump({"images": images, "annotations": annos}, f)
    with open(tmp_path / "categories.json", "w") as f:
        json.dump(categories, f)

    ds = build_dataset(True, data_set="INAT", data_path=str(tmp_path),
                       transform=EvalTransform(16))
    assert len(ds) == 6 and ds.num_classes == 3
    img, label = ds.load(4, np.random.default_rng(0))
    assert img.shape == (16, 16, 3) and label == 4 % 3

    # coarser taxonomic granularity collapses classes
    ds_genus = build_dataset(True, data_set="INAT", data_path=str(tmp_path),
                             transform=EvalTransform(16), inat_category="genus")
    assert ds_genus.num_classes == 2


def test_loader_process_backend_matches_thread_backend():
    """Process workers (torch-DataLoader model, reference main.py:291-306)
    produce bit-identical batches to thread workers, and the stream is
    independent of worker count (rng is per (seed, epoch, batch))."""
    from vit_search_tpu.data import DataLoader, ShardedSampler
    from vit_search_tpu.data.datasets import SyntheticDataset
    from vit_search_tpu.data.transforms import TrainTransform

    ds = SyntheticDataset(num_classes=4, length=24, img_size=32,
                          transform=TrainTransform(size=32))
    sampler = ShardedSampler(len(ds), 1, 0, shuffle=True)

    def batches(backend, workers):
        loader = DataLoader(ds, sampler, 8, num_workers=workers,
                            drop_last=True, seed=7, worker_backend=backend)
        loader.set_epoch(3)
        return list(loader)

    t1 = batches("thread", 1)
    t4 = batches("thread", 4)
    p2 = batches("process", 2)
    assert len(t1) == 3
    for (ia, la), (ib, lb), (ic, lc) in zip(t1, t4, p2):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ia, ic)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(la, lc)

    with pytest.raises(ValueError):
        DataLoader(ds, sampler, 8, worker_backend="greenlet")


class _RaisingDataset(SyntheticDataset):
    """Raises on one index (a 'corrupt image'); fork-inherited by workers."""

    def __init__(self, bad_index, **kw):
        super().__init__(**kw)
        self.bad_index = bad_index

    def load(self, index, rng):
        if index == self.bad_index:
            raise OSError(f"simulated corrupt image at index {index}")
        return super().load(index, rng)


class _DyingDataset(SyntheticDataset):
    """Hard-kills the worker process on one index (codec segfault / OOM)."""

    def __init__(self, bad_index, **kw):
        super().__init__(**kw)
        self.bad_index = bad_index

    def load(self, index, rng):
        if index == self.bad_index:
            os._exit(3)
        return super().load(index, rng)


def test_thread_loader_worker_exception_propagates():
    """Default (thread) backend: a worker exception must fail the run
    loudly too — previously the thread died silently and the consumer
    blocked forever (advisor round-4 finding)."""
    ds = _RaisingDataset(bad_index=5, num_classes=4, size=8, length=16,
                         img_size=8, transform=EvalTransform(size=8))
    loader = DataLoader(ds, ShardedSampler(len(ds), 1, 0, shuffle=False), 4,
                        num_workers=2, drop_last=True, seed=0,
                        worker_backend="thread")
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)


def test_process_loader_worker_exception_propagates():
    """A worker exception must fail the run loudly, not wedge the parent
    in res_q.get() forever (advisor round-3 finding)."""
    ds = _RaisingDataset(bad_index=5, num_classes=4, size=8, length=16,
                         img_size=8, transform=EvalTransform(size=8))
    loader = DataLoader(ds, ShardedSampler(len(ds), 1, 0, shuffle=False), 4,
                        num_workers=2, drop_last=True, seed=0,
                        worker_backend="process")
    with pytest.raises(RuntimeError, match="worker failed"):
        list(loader)


def test_process_loader_worker_death_detected():
    """A worker killed by the OS can't report an exception; the parent's
    liveness check must raise instead of blocking forever."""
    ds = _DyingDataset(bad_index=5, num_classes=4, size=8, length=16,
                       img_size=8, transform=EvalTransform(size=8))
    loader = DataLoader(ds, ShardedSampler(len(ds), 1, 0, shuffle=False), 4,
                        num_workers=2, drop_last=True, seed=0,
                        worker_backend="process")
    with pytest.raises(RuntimeError, match="died with exit code|never arrived"):
        list(loader)
