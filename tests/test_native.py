"""Native (C++) search-runtime tests: exact cost parity + operator validity."""

import numpy as np
import pytest

from vit_search_tpu.arch import ComputationEstimator, presets, spaces
from vit_search_tpu.arch import network_def as nd
from vit_search_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

LARGEST = presets.SUPERNET_SR_TINY
SPACE = spaces.get_space("sr_tiny")
EST = ComputationEstimator(distill=True, input_resolution=224, patch_size=14)
CONSTRAINT = EST(LARGEST) * 0.37


def _ops():
    return native.NativeSearchOps(LARGEST, SPACE, CONSTRAINT, distill=True,
                                  input_resolution=224, patch_size=14)


def test_encode_decode_roundtrip():
    for name, net in presets.PRESETS.items():
        flat = native.encode_net(net)
        assert native.decode_net(flat, net) == net, name


def test_native_cost_matches_python_exactly():
    ops = _ops()
    for net in (presets.SUPERNET_SR_TINY, presets.VIT_RESNAS_TINY,
                presets.VIT_RESNAS_MEDIUM, presets.VIT_RES_TINY,
                presets.SUPERNET_SR_SMALL_FLEX):
        # align estimator settings per-net via a fresh ops if template differs
        o = native.NativeSearchOps(net, [None] * len(net), 1.0, distill=True)
        assert o.estimate_mac(net) == EST(net), net[0]


def test_native_cost_with_removed_blocks():
    net = nd.to_mutable(presets.SUPERNET_SR_TINY)
    net[2][3] = 0
    net = nd.to_immutable(net)
    o = native.NativeSearchOps(net, [None] * len(net), 1.0, distill=True)
    assert o.estimate_mac(net) == EST(net)


def test_native_gen_random_in_band_and_space():
    ops = _ops()
    lo = 0.975 * CONSTRAINT
    for seed in range(5):
        net = ops.gen_random(seed)
        nd.validate(net)
        mac = EST(net)
        assert lo <= mac <= CONSTRAINT
        # candidate widths come from the space
        for i, block in enumerate(net):
            keep = SPACE[i]
            if nd.block_type(block) in nd.EMBED_TYPES:
                assert block[1] in [int(x) for x in keep]
            elif nd.block_type(block) == nd.TRANSFORMER and block[3]:
                assert nd.transformer_def(block).attn_width in \
                    [int(x) for x in keep["attn"]]


def test_native_mutate_and_crossover():
    ops = _ops()
    lo = 0.975 * CONSTRAINT
    a = ops.gen_random(1)
    b = ops.gen_random(2)
    child = ops.mutate(a, 0.3, seed=3)
    nd.validate(child)
    assert lo <= EST(child) <= CONSTRAINT
    cross = ops.crossover(a, b, seed=4)
    nd.validate(cross)
    assert lo <= EST(cross) <= CONSTRAINT
    for i, block in enumerate(cross):
        if nd.block_type(block) == nd.TRANSFORMER:
            assert block[1][1] in (a[i][1][1], b[i][1][1])


def test_native_determinism():
    ops = _ops()
    assert ops.gen_random(42) == ops.gen_random(42)
    assert ops.gen_random(42) != ops.gen_random(43)


def test_native_speedup_over_python():
    """The point of the native path: proposal generation is much faster."""
    import time

    from vit_search_tpu.search import generators

    ops = _ops()
    n = 20
    t0 = time.perf_counter()
    for seed in range(n):
        ops.gen_random(seed)
    t_native = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for _ in range(n):
        generators.gen_random_network_def(LARGEST, SPACE, CONSTRAINT, EST, rng=rng)
    t_python = time.perf_counter() - t0

    assert t_native < t_python, (t_native, t_python)
    print(f"native {n / t_native:.0f} cands/s vs python {n / t_python:.0f} cands/s")
