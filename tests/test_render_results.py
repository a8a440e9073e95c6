"""RESULTS.md renderer: all summary variants produce complete markdown."""

import json
import subprocess
import sys

CURVE = [{"epoch": 0, "train_loss": 4.0, "test_acc1": 20.0, "test_acc5": 40.0},
         {"epoch": 1, "train_loss": 3.0, "test_acc1": 30.0, "test_acc5": 55.0}]

BASE = {
    "supernet_curve": CURVE,
    "search_best_per_iter": ["iter 0: score=5.3"],
    "winner_def": "((2,))",
    "winner_mac": 1_700_000_000,
    "winner_curve": CURVE,
    "winner_final_acc1": 30.0,
}


def render(tmp_path, summary):
    src = tmp_path / "s.json"
    out = tmp_path / "R.md"
    src.write_text(json.dumps(summary))
    subprocess.check_call([sys.executable, "-m",
                           "vit_search_tpu.tools.render_results",
                           str(src), str(out)])
    return out.read_text()


def test_minimal_summary_renders(tmp_path):
    txt = render(tmp_path, BASE)
    assert "## 1. Supernet training learns" in txt
    assert "searched winner" in txt and "1.700G" in txt
    # no control rows/sections without control curves in the summary
    assert "random (same budget)" not in txt
    assert "Random-control retrain curve" not in txt


def test_full_summary_renders_controls_finetune_eval(tmp_path):
    s = dict(BASE)
    for tag in ("random", "worst"):
        s.update({f"{tag}_def": "((3,))", f"{tag}_mac": 1_750_000_000,
                  f"{tag}_curve": CURVE, f"{tag}_final_acc1": 25.0})
    s.update({"finetune_size": 280, "finetune_curve": CURVE,
              "eval_only": "{'acc1': 30.0}"})
    txt = render(tmp_path, s)
    assert "random (same budget)" in txt and "worst (same budget)" in txt
    assert "Worst-control retrain curve" in txt
    assert "Higher-resolution finetune" in txt and "280px" in txt
    assert "Standalone `--eval`" in txt
    assert "worst network_def" in txt


def test_seed_table_and_rankcorr_render(tmp_path):
    s = dict(BASE)
    s.update({"random_def": "((3,))", "random_mac": 1_750_000_000,
              "random_curve": CURVE, "random_final_acc1": 25.0,
              "winner_final_acc1_by_seed": {"0": 30.0, "1": 31.0, "2": 29.5},
              "random_final_acc1_by_seed": {"0": 25.0, "1": 24.0, "2": 26.0},
              "rankcorr": {
                  "entries": [
                      {"history_rank": 0, "fitness": 12.0,
                       "mac": 1_700_000_000, "retrained_acc1": 31.0,
                       "network_def": "((2,))"},
                      {"history_rank": 9, "fitness": 8.0,
                       "mac": 1_650_000_000, "retrained_acc1": 27.0,
                       "network_def": "((4,))"}],
                  "kendall_tau": 1.0, "concordant": 1, "discordant": 0}})
    txt = render(tmp_path, s)
    assert "Per-seed finals" in txt
    assert "| 1 | 31.00% | 24.00% | +7.00 |" in txt
    assert "winner: mean 30.17%" in txt
    assert "Kendall tau = 1.000" in txt
    assert "| 9 | 8.00% | 1.650G | 27.00% |" in txt


def test_seed_table_without_random_control(tmp_path):
    s = dict(BASE)
    s["winner_final_acc1_by_seed"] = {"0": 30.0, "1": 31.0}
    txt = render(tmp_path, s)
    assert "Per-seed finals" in txt and "winner − random" not in txt


def test_kendall_exact_p_matches_brute_force_and_published_case():
    """The inversion-count DP equals brute-force permutation enumeration
    at small n, handles the degenerate extremes, refuses ties, and
    reproduces the published n=8 study figure (RESULTS_112px.md)."""
    from itertools import permutations

    from vit_search_tpu.tools.render_results import kendall_exact_one_sided_p

    def brute(n, d_obs):
        tot = ge = 0
        base = list(range(n))
        for p in permutations(base):
            d = sum(1 for i in range(n) for j in range(i + 1, n)
                    if p[i] > p[j])
            tot += 1
            ge += d <= d_obs
        return ge / tot

    for n in (3, 4, 5, 6):
        pairs = n * (n - 1) // 2
        for d in range(pairs + 1):
            dp = kendall_exact_one_sided_p(n, pairs - d, d)
            assert abs(dp - brute(n, d)) < 1e-12, (n, d)

    # perfect concordance: p = 1/n!
    assert kendall_exact_one_sided_p(4, 6, 0) == 1 / 24
    # ties (C + D < pairs): exact null doesn't apply
    assert kendall_exact_one_sided_p(4, 4, 1) is None
    # the published study: n=8, 20 concordant / 8 discordant
    assert abs(kendall_exact_one_sided_p(8, 20, 8) - 0.089435) < 5e-6
