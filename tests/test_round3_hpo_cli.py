"""Round-3 HPO/CLI fixes: MedianPruner-semantics fallback pruner (reference
main.py:453 MedianPruner defaults), follower trial numbering carried in the
leader announce, and --strict_chaining."""

import dataclasses
import os
import pickle

import numpy as np
import pytest

from multimodal_neuroimage_tpu.config import Config


# ---------------------------------------------------------------------------
# Fallback pruner: optuna MedianPruner semantics
# ---------------------------------------------------------------------------

def _trial(number, history, completed, maximize=True):
    from multimodal_neuroimage_tpu.hpo.optuna_harness import _FallbackTrial
    return _FallbackTrial(number, np.random.default_rng(0), history,
                          maximize, completed)


def test_strong_early_trial_not_pruned_at_first_report():
    """A strong trial must survive its first report even when peers exist —
    the round-2 pruner killed any below-median trial immediately."""
    history, completed = {}, set()
    # five completed startup trials with mediocre curves
    for n in range(5):
        t = _trial(n, history, completed)
        for step, v in enumerate((0.5, 0.55, 0.6)):
            t.report(v, step)
        completed.add(n)
    strong = _trial(5, history, completed)
    strong.report(0.9, 0)          # well above the median (0.5) at step 0
    assert strong.should_prune() is False


def test_no_pruning_before_startup_trials_complete():
    """optuna default n_startup_trials=5: with fewer completed trials, even a
    terrible trial is never pruned."""
    history, completed = {}, set()
    for n in range(4):             # only 4 completed — below the threshold
        t = _trial(n, history, completed)
        t.report(0.9, 0)
        completed.add(n)
    weak = _trial(4, history, completed)
    weak.report(0.01, 0)
    assert weak.should_prune() is False


def test_below_median_trial_pruned_after_startup():
    history, completed = {}, set()
    for n in range(5):
        t = _trial(n, history, completed)
        t.report(0.8, 0)
        completed.add(n)
    weak = _trial(5, history, completed)
    weak.report(0.1, 0)
    assert weak.should_prune() is True
    # minimize direction flips the comparison
    history2, completed2 = {}, set()
    for n in range(5):
        t = _trial(n, history2, completed2, maximize=False)
        t.report(0.2, 0)
        completed2.add(n)
    weak2 = _trial(5, history2, completed2, maximize=False)
    weak2.report(0.9, 0)
    assert weak2.should_prune() is True


def test_best_intermediate_value_governs():
    """optuna prunes on the trial's BEST intermediate so far, not the latest:
    a trial that peaked above the median then dipped is kept."""
    history, completed = {}, set()
    for n in range(5):
        t = _trial(n, history, completed)
        t.report(0.5, 0)
        t.report(0.5, 1)
        completed.add(n)
    dip = _trial(5, history, completed)
    dip.report(0.7, 0)             # best-so-far 0.7 > median 0.5
    dip.report(0.3, 1)             # latest dipped below
    assert dip.should_prune() is False


# ---------------------------------------------------------------------------
# Follower trial numbering mirrors the leader announce
# ---------------------------------------------------------------------------

def test_follower_trial_numbering_mirrors_leader(monkeypatch, tmp_path):
    """Run the REAL follower loop of run_study against a scripted message
    stream in which the leader skipped trial 1 (pre-announce failure): the
    follower must create trial_0 and trial_2 folders — the leader's
    numbering — not trial_0/trial_1 from a local counter."""
    from multimodal_neuroimage_tpu.hpo import optuna_harness as oh

    msgs = iter([
        {"kind": "trial", "stop": False, "params": {"lr_init": 1e-4},
         "number": 0},
        # leader trial #1 failed before its announce -> number skipped
        {"kind": "trial", "stop": False, "params": {"lr_init": 2e-4},
         "number": 2},
        {"kind": "trial", "stop": True},
    ])
    monkeypatch.setattr(oh, "_broadcast_obj", lambda obj: next(msgs))
    monkeypatch.setattr(
        oh, "jax", type("J", (), {
            "process_count": staticmethod(lambda: 2),
            "process_index": staticmethod(lambda: 1)}))

    folders = []

    class FakeTrainer:
        def __init__(self, trial_cfg, sets=None):
            folders.append(os.path.basename(trial_cfg.experiment_folder))

        def training(self):
            return {"val_AUROC": 0.5}

    import multimodal_neuroimage_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, "Trainer", FakeTrainer)

    cfg = Config(experiment_folder=str(tmp_path), opt_num_epochs=1,
                 use_optuna=True)
    out = oh.run_study(cfg)
    assert out == {}
    assert folders == ["trial_0", "trial_2"]


# ---------------------------------------------------------------------------
# --strict_chaining
# ---------------------------------------------------------------------------

def _make_experiment(root, task, target, exp_name, stamp):
    folder = os.path.join(root, "experiments", f"{exp_name}_{target}_{stamp}")
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "arguments.pkl"), "wb") as f:
        pickle.dump({"task": task, "target": target, "exp_name": exp_name}, f)
    with open(os.path.join(folder,
                           f"{exp_name}_BEST_val_AUROC.ckpt"), "wb") as f:
        f.write(b"x")
    return folder


def test_strict_chaining_raises_with_candidates(tmp_path):
    from multimodal_neuroimage_tpu.cli.main import weight_loader
    root = str(tmp_path)
    # only a CROSS-target (sex) VIT checkpoint exists; target is ADHD
    _make_experiment(root, "VIT", "sex", "exp_a", "20260101_000000")
    cfg = Config(base_path=root, step=5, task="FuncStruct", target="ADHD_label",
                 strict_chaining=True)
    with pytest.raises(FileNotFoundError, match="strict_chaining"):
        weight_loader(cfg)
    # default (non-strict) keeps the transfer fallback
    cfg2 = dataclasses.replace(cfg, strict_chaining=False)
    path = weight_loader(cfg2)
    assert path and "exp_a" in path


def test_strict_chaining_passes_on_same_target(tmp_path):
    from multimodal_neuroimage_tpu.cli.main import weight_loader
    root = str(tmp_path)
    _make_experiment(root, "VIT", "sex", "decoy_cross", "20260101_000000")
    good = _make_experiment(root, "VIT", "ADHD_label", "exp_b",
                            "20260102_000000")
    cfg = Config(base_path=root, step=5, task="FuncStruct",
                 target="ADHD_label", strict_chaining=True)
    path = weight_loader(cfg)
    assert path and path.startswith(good)
