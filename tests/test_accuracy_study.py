"""Plumbing test for the end-to-end accuracy study driver.

Runs ``tools/accuracy_study.main`` with every subprocess stubbed out,
asserting the flag wiring the real TPU runs rely on: the reduced-resolution
axis (``--input-size`` -> ``--mixup-patch-len`` and the area-scaled MAC
constraint), artifact handoff between stages (history.csv winner parsing),
and the final summary JSON.  The real thing runs on the TPU
(see RESULTS.md); this pins the driver's wiring on CPU.
"""

import json
import os

import pytest

from vit_search_tpu.tools import accuracy_study


# a valid sr_tiny_mh-space member (produced by a real search run)
WINNER_DEF = ("((4, 176), (1, (176, 3, 32), (176, 704), 1), "
              "(1, (176, 3, 32), (176, 704), 0), (1, (176, 3, 32), (176, 640), 1), "
              "(1, (176, 3, 32), (176, 384), 0), (1, (176, 3, 32), (176, 640), 1), "
              "(1, (176, 3, 32), (176, 576), 1), (3, 176, 384), "
              "(1, (384, 6, 48), (384, 1152), 1), (1, (384, 8, 48), (384, 1408), 1), "
              "(1, (384, 10, 48), (384, 1536), 1), (1, (384, 6, 48), (384, 1024), 0), "
              "(1, (384, 10, 48), (384, 1152), 1), (1, (384, 10, 48), (384, 1408), 1), "
              "(3, 384, 896), (1, (896, 8, 64), (896, 1536), 1), "
              "(1, (896, 6, 64), (896, 2816), 1), (1, (896, 10, 64), (896, 1536), 1), "
              "(1, (896, 8, 64), (896, 2304), 1), (1, (896, 10, 64), (896, 2560), 1), "
              "(1, (896, 10, 64), (896, 1536), 1), (2, 896, 100))")


@pytest.mark.parametrize("input_size,patch_len", [(112, 2), (224, 4)])
def test_study_driver_plumbing(tmp_path, monkeypatch, input_size, patch_len):
    cmds = []

    def fake_sh(cmd, log_path=None):
        cmds.append(cmd)
        joined = " ".join(cmd)
        if "vit_search_tpu.cli.evo_search" in joined:
            out = cmd[cmd.index("--output_dir") + 1]
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, "history.csv"), "w") as f:
                f.write('rank,score,network_def\n0,5.3,"%s"\n' % WINNER_DEF)
            with open(os.path.join(out, "summary.txt"), "w") as f:
                f.write("iter 0: score=5.3\n")
        elif "vit_search_tpu.cli.train" in joined and "--network-def" in joined:
            out = cmd[cmd.index("--output_dir") + 1]
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, "log.txt"), "w") as f:
                f.write(json.dumps({"epoch": 0, "train_loss": 4.0,
                                    "test_acc1": 10.0, "test_acc5": 30.0}) + "\n")

    monkeypatch.setattr(accuracy_study, "sh", fake_sh)
    monkeypatch.setattr(
        "sys.argv",
        ["accuracy_study", "--root", str(tmp_path), "--skip-generate",
         "--input-size", str(input_size)])
    accuracy_study.main()

    train_cmds = [c for c in cmds if "vit_search_tpu.cli.train" in " ".join(c)
                  and "--eval" not in c and "--finetune" not in c]
    ft_cmds = [c for c in cmds if "--finetune" in c]
    eval_cmds = [c for c in cmds if "--eval" in c]
    search_cmds = [c for c in cmds if "evo_search" in " ".join(c)]
    assert len(train_cmds) == 3  # supernet + winner + random control
    assert len(search_cmds) == 1
    assert len(ft_cmds) == 1 and len(eval_cmds) == 1

    for cmd in train_cmds:
        assert cmd[cmd.index("--input-size") + 1] == str(input_size)
        assert cmd[cmd.index("--mixup-patch-len") + 1] == str(patch_len)

    # finetune + eval run at the next 56-multiple with matching patch len
    ft_size, ft_len = input_size + 56, patch_len + 1
    for cmd in ft_cmds + eval_cmds:
        assert cmd[cmd.index("--input-size") + 1] == str(ft_size)
        assert cmd[cmd.index("--mixup-patch-len") + 1] == str(ft_len)
    assert ft_cmds[0][ft_cmds[0].index("--finetune") + 1].endswith(
        os.path.join("retrain_winner", "checkpoints", "checkpoint"))
    assert eval_cmds[0][eval_cmds[0].index("--resume") + 1].endswith(
        os.path.join("finetune", "checkpoints", "checkpoint"))

    # MAC budget scales with the token-grid area
    constraint = float(
        search_cmds[0][search_cmds[0].index("--constraint-value") + 1])
    assert constraint == pytest.approx(1.7944e9 * (input_size / 224.0) ** 2)

    with open(tmp_path / "study_summary.json") as f:
        summary = json.load(f)
    assert summary["winner_def"] == WINNER_DEF
    assert summary["winner_final_acc1"] == 10.0
    assert summary["winner_mac"] > 0 and summary["random_mac"] > 0
    # the random control respects the same scaled budget
    assert summary["random_mac"] <= constraint
    assert summary["finetune_size"] == ft_size
    assert "eval_only" in summary


def test_worst_control_uses_bottom_of_history(tmp_path, monkeypatch):
    """--controls random,worst retrains the lowest-ranked history member."""
    worst_def = WINNER_DEF.replace("(2, 896, 100))", "(2, 832, 100))")
    cmds = []

    def fake_sh(cmd, log_path=None):
        cmds.append(cmd)
        joined = " ".join(cmd)
        if "evo_search" in joined:
            out = cmd[cmd.index("--output_dir") + 1]
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, "history.csv"), "w") as f:
                f.write('rank,score,network_def\n0,5.3,"%s"\n1,2.0,"%s"\n'
                        % (WINNER_DEF, worst_def))
            with open(os.path.join(out, "summary.txt"), "w") as f:
                f.write("iter 0: score=5.3\n")
        elif "--network-def" in cmd:
            out = cmd[cmd.index("--output_dir") + 1]
            os.makedirs(out, exist_ok=True)
            with open(os.path.join(out, "log.txt"), "w") as f:
                f.write(json.dumps({"epoch": 0, "train_loss": 4.0,
                                    "test_acc1": 10.0,
                                    "test_acc5": 30.0}) + "\n")

    monkeypatch.setattr(accuracy_study, "sh", fake_sh)
    monkeypatch.setattr(
        "sys.argv",
        ["accuracy_study", "--root", str(tmp_path), "--skip-generate",
         "--controls", "random,worst", "--stages",
         "supernet,search,retrain"])
    accuracy_study.main()

    retrain_defs = [c[c.index("--network-def") + 1] for c in cmds
                    if "cli.train" in " ".join(c) and "--search-space" not in c]
    assert len(retrain_defs) == 3  # winner + random + worst
    assert retrain_defs[0] == WINNER_DEF
    assert retrain_defs[2] == worst_def

    with open(tmp_path / "study_summary.json") as f:
        summary = json.load(f)
    assert summary["worst_def"] == worst_def
    assert summary["worst_mac"] > 0
    assert summary["random_def"] != worst_def


def test_study_stage_selection(tmp_path, monkeypatch):
    """Re-running only late stages must consume prior on-disk artifacts
    and merge into the existing summary instead of overwriting it."""
    cmds = []

    def fake_sh(cmd, log_path=None):
        cmds.append(cmd)

    search_out = tmp_path / "search"
    search_out.mkdir()
    (search_out / "history.csv").write_text(
        'rank,score,network_def\n0,5.3,"%s"\n' % WINNER_DEF)
    (search_out / "summary.txt").write_text("iter 0: score=5.3\n")
    (tmp_path / "finetune").mkdir()
    (tmp_path / "finetune" / "log.txt").write_text(
        json.dumps({"epoch": 0, "train_loss": 3.0,
                    "test_acc1": 12.0, "test_acc5": 33.0}) + "\n")
    (tmp_path / "study_summary.json").write_text(
        json.dumps({"winner_final_acc1": 10.0, "random_final_acc1": 9.0}))

    monkeypatch.setattr(accuracy_study, "sh", fake_sh)
    monkeypatch.setattr(
        "sys.argv",
        ["accuracy_study", "--root", str(tmp_path),
         "--stages", "finetune,eval"])
    accuracy_study.main()

    assert not any("evo_search" in " ".join(c) for c in cmds)
    assert not any("--search-space" in c for c in cmds)  # no supernet train
    assert len(cmds) == 2  # finetune + eval only

    with open(tmp_path / "study_summary.json") as f:
        summary = json.load(f)
    # merged: prior retrain numbers survive, new stage keys added
    assert summary["winner_final_acc1"] == 10.0
    assert summary["random_final_acc1"] == 9.0
    assert summary["finetune_curve"][0]["test_acc1"] == 12.0
    assert summary["winner_def"] == WINNER_DEF
