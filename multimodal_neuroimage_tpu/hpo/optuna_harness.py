"""Hyperparameter optimization harness.

Mirrors the reference's Optuna loop (reference main.py:362-498): TPE sampler +
median pruner over {lr_init, weight_decay, batch_size, dropouts, layers,
heads}, per-epoch ``trial.report`` + pruning inside training
(trainer.py:319-331), best-params dump to pkl/txt (main.py:491-498).

Optuna is not part of this image's baked dependencies, so the harness runs on
optuna when importable and otherwise falls back to a built-in random-search +
median-pruning implementation with the same search space and artifacts.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any, Dict

import numpy as np

SEARCH_SPACE = {
    # (kind, low, high/choices, log) — reference main.py:399-422
    "lr_init": ("float", 1e-5, 1e-3, True),
    "weight_decay": ("float", 1e-5, 1e-2, True),
    "transformer_dropout_rate": ("float", 0.0, 0.5, False),
    "batch_size": ("cat", [4, 8, 16], None, False),
    "transformer_hidden_layers": ("cat", [4, 8, 16], None, False),
    "num_heads_2DBert": ("cat", [4, 6, 12], None, False),
}


def _suggest(trial, cfg) -> Dict[str, Any]:
    overrides: Dict[str, Any] = {}
    for name, (kind, lo, hi, log) in SEARCH_SPACE.items():
        if kind == "float":
            overrides[name] = trial.suggest_float(name, lo, hi, log=log)
        else:
            overrides[name] = trial.suggest_categorical(name, lo)
    return overrides


def _objective_value(cfg, metrics, trainer) -> float:
    if cfg.fine_tune_task == "binary_classification":
        return metrics.get("val_AUROC", 0.0)
    hist = trainer.writer.loss_history.get("total_val_loss_history", [])
    return hist[-1] if hist else float("inf")


def _dump_best(cfg, params: Dict[str, Any], value: float) -> None:
    folder = cfg.experiment_folder or "."
    with open(os.path.join(folder, "best_params.pkl"), "wb") as f:
        pickle.dump(params, f)
    with open(os.path.join(folder, "best_params.txt"), "w") as f:
        f.write(f"objective: {value}\n")
        for k, v in params.items():
            f.write(f"{k}: {v}\n")


def run_study(cfg) -> Dict[str, Any]:
    from multimodal_neuroimage_tpu.train.trainer import Trainer

    def train_trial(trial) -> float:
        overrides = _suggest(trial, cfg)
        trial_cfg = dataclasses.replace(
            cfg, nEpochs=cfg.opt_num_epochs, use_optuna=False,
            experiment_folder=os.path.join(
                cfg.experiment_folder or ".", f"trial_{trial.number}"),
            **overrides)
        trainer = Trainer(trial_cfg)
        trainer.optuna_trial = trial
        metrics = trainer.training()
        return _objective_value(cfg, metrics, trainer)

    try:
        import optuna
        direction = ("maximize"
                     if cfg.fine_tune_task == "binary_classification"
                     else "minimize")
        storage = f"sqlite:///{cfg.experiment_folder or '.'}/optuna.db"
        study = optuna.create_study(
            study_name=cfg.exp_name, direction=direction, storage=storage,
            load_if_exists=True, sampler=optuna.samplers.TPESampler(),
            pruner=optuna.pruners.MedianPruner())
        study.optimize(train_trial, n_trials=cfg.num_trials,
                       catch=(RuntimeError,))
        _dump_best(cfg, study.best_params, study.best_value)
        return {"best_value": study.best_value, **study.best_params}
    except ImportError:
        return _fallback_random_search(cfg, train_trial)


class _FallbackTrial:
    """Minimal optuna.Trial stand-in: suggest_* + report/should_prune with
    median pruning against completed trials."""

    def __init__(self, number: int, rng: np.random.Generator,
                 history: Dict[int, Dict[int, float]], maximize: bool):
        self.number = number
        self._rng = rng
        self._history = history
        self._maximize = maximize
        self.params: Dict[str, Any] = {}
        self._reports: Dict[int, float] = {}

    def suggest_float(self, name, lo, hi, log=False):
        if log:
            v = float(np.exp(self._rng.uniform(np.log(lo), np.log(hi))))
        else:
            v = float(self._rng.uniform(lo, hi))
        self.params[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = choices[int(self._rng.integers(len(choices)))]
        self.params[name] = v
        return v

    def report(self, value: float, step: int) -> None:
        self._reports[step] = value
        self._history.setdefault(self.number, {})[step] = value

    def should_prune(self) -> bool:
        if not self._reports:
            return False
        step, value = max(self._reports.items())
        peers = [h[step] for n, h in self._history.items()
                 if n != self.number and step in h]
        if len(peers) < 2:
            return False
        med = float(np.median(peers))
        return value < med if self._maximize else value > med


class _Pruned(Exception):
    pass


def _fallback_random_search(cfg, train_trial) -> Dict[str, Any]:
    maximize = cfg.fine_tune_task == "binary_classification"
    rng = np.random.default_rng(cfg.seed)
    history: Dict[int, Dict[int, float]] = {}
    best_value = -np.inf if maximize else np.inf
    best_params: Dict[str, Any] = {}
    for n in range(cfg.num_trials):
        trial = _FallbackTrial(n, rng, history, maximize)
        try:
            value = train_trial(trial)
        except Exception as e:  # pruned or failed trial
            if type(e).__name__ not in ("TrialPruned", "_Pruned"):
                print(f"trial {n} failed: {e}")
            continue
        better = value > best_value if maximize else value < best_value
        if better:
            best_value, best_params = value, dict(trial.params)
    _dump_best(cfg, best_params, best_value)
    return {"best_value": best_value, **best_params}
