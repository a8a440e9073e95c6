"""Cost-model parity tests.

Golden integers were produced by executing the reference cost model
(network_utils/compute_flop_mac.py) directly; they include the published MAC
budgets (the ViT-ResNAS-Tiny reference net is exactly the 1.7944G search
constraint of scripts/vit-sr-nas/evolutionary_search/tiny.sh).
"""

import pytest

from vit_search_tpu.arch import (ComputationEstimator, compute_from_network_def,
                                 presets, validate)


def test_flat_vit_macs_match_reference_goldens():
    assert compute_from_network_def(presets.VIT_TINY) == 1_261_003_776
    assert compute_from_network_def(presets.VIT_SMALL) == 4_624_140_288


def test_flat_vit_flops_match_reference_goldens():
    assert compute_from_network_def(presets.VIT_TINY, return_mac=False) == 2_555_127_360


def test_estimator_matches_functional_path_on_flat_vits():
    est = ComputationEstimator(distill=True, input_resolution=224, patch_size=16)
    for nd in (presets.VIT_TINY, presets.VIT_SMALL, presets.VIT_BASE):
        assert est(nd) == compute_from_network_def(nd)


def test_estimator_resolution_192():
    est = ComputationEstimator(distill=True, input_resolution=192, patch_size=16)
    assert est(presets.VIT_TINY) == compute_from_network_def(presets.VIT_TINY, resolution=192)


def test_sr_supernet_goldens():
    est_distill = ComputationEstimator(distill=True, input_resolution=224, patch_size=14)
    est_plain = ComputationEstimator(distill=False, input_resolution=224, patch_size=14)
    assert est_distill(presets.SUPERNET_SR_TINY) == 3_538_831_360
    assert est_plain(presets.SUPERNET_SR_TINY) == 3_473_465_856
    assert est_plain(presets.SUPERNET_SR_SMALL_FLEX) == 6_004_309_888
    assert est_distill(presets.SUPERNET_SR_SMALL_FLEX) == 6_140_349_952
    assert est_plain(presets.SUPERNET_SR_SMALL_MH) == 6_260_342_784
    assert est_plain(presets.SUPERNET_SR_TINY_MH) == 3_497_553_920
    assert est_plain(presets.VIT_RESNAS_TINY) == 1_782_630_272
    assert est_plain(presets.VIT_RESNAS_SMALL) == 2_845_501_856
    assert est_plain(presets.VIT_RESNAS_MEDIUM) == 4_513_135_936


def test_sr_flops_golden():
    est = ComputationEstimator(distill=False, input_resolution=224, patch_size=14,
                               return_mac=False)
    assert est(presets.SUPERNET_SR_TINY) == 6_993_560_192


def test_vit_res_tiny_is_the_published_search_constraint():
    est = ComputationEstimator(distill=False, input_resolution=224, patch_size=14)
    assert est(presets.VIT_RES_TINY) == 1_794_378_240  # --constraint-value 1794400000


def test_searched_nets_fit_their_constraints():
    est = ComputationEstimator(distill=False, input_resolution=224, patch_size=14)
    assert est(presets.VIT_RESNAS_TINY) <= 1_794_400_000
    assert est(presets.VIT_RESNAS_SMALL) <= 2_900_000_000
    assert est(presets.VIT_RESNAS_MEDIUM) <= 4_600_000_000
    # and are within the 0.975 lower band the search enforces
    assert est(presets.VIT_RESNAS_TINY) >= 0.9 * 1_794_400_000


def test_removed_blocks_cost_nothing():
    nd = list(presets.VIT_TINY)
    nd[3] = (1, (192, 3, 64), (192, 768), 0)
    est = ComputationEstimator(distill=True, input_resolution=224, patch_size=16)
    full = est(presets.VIT_TINY)
    pruned = est(tuple(nd))
    assert pruned < full
    nd_all = [presets.VIT_TINY[0]] + \
        [(1, (192, 3, 64), (192, 768), 0)] * 12 + [presets.VIT_TINY[-1]]
    assert est(tuple(nd_all)) == full - 12 * (full - pruned)


def test_presets_validate():
    for name, nd in presets.PRESETS.items():
        validate(nd)


def test_estimator_rejects_inconsistent_widths():
    bad = ((0, 192), (1, (256, 4, 64), (256, 1024), 1), (2, 256, 1000))
    est = ComputationEstimator(distill=True, input_resolution=224, patch_size=16)
    with pytest.raises(AssertionError):
        est(bad)
