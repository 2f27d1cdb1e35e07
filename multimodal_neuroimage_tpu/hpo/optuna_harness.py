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
import glob
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

SEARCH_SPACE = {
    # (kind, low, high/choices, log) — reference main.py:399-422
    "lr_init": ("float", 1e-5, 1e-3, True),
    "lr_gamma": ("float", 0.90, 0.99, False),   # 'gamma' (main.py:514-517)
    "weight_decay": ("float", 1e-5, 1e-2, True),
    "transformer_dropout_rate": ("float", 0.0, 0.5, False),
    "batch_size": ("cat", [4, 8, 16], None, False),
    "transformer_hidden_layers": ("cat", [4, 8, 16], None, False),
    "num_heads_2DBert": ("cat", [4, 6, 12], None, False),
}


# ---------------------------------------------------------------------------
# Multi-process coordination (reference main.py:440-460: rank 0 owns the
# study; other ranks run the same trials). Under a multi-host mesh every
# process MUST train with identical trial params, otherwise the jitted
# programs differ and the gradient collectives deadlock.
# ---------------------------------------------------------------------------

_BCAST_BYTES = 4096
_seq = 0          # per-process message counter — drift detector
_pending = None   # follower-side stash for an out-of-phase message


class TrialAborted(Exception):
    """Leader announced a leader-local trial failure; followers abandon the
    trial and return to the announce loop."""


def _broadcast_obj(obj: Optional[Any]) -> Any:
    """Process-0's pickled object, on every process.

    EVERY cross-process exchange in this module goes through this one
    primitive with one fixed buffer shape, so no interleaving of announce /
    prune / abort messages can ever put two processes into shape-mismatched
    collectives. Each message carries a sequence number; a count drift
    (process consumed a different number of messages than the leader sent)
    raises loudly instead of silently mis-executing. Leader-side failures
    (e.g. oversized payload) are converted into an error message that is
    STILL broadcast — every process raises together instead of the
    followers hanging."""
    global _seq
    from jax.experimental import multihost_utils
    buf = np.zeros(_BCAST_BYTES, np.uint8)
    if jax.process_index() == 0:
        raw = pickle.dumps({"seq": _seq, "msg": obj})
        if len(raw) > _BCAST_BYTES - 4:
            raw = pickle.dumps({"seq": _seq, "msg": {
                "error": f"broadcast payload too large "
                         f"({len(raw)} > {_BCAST_BYTES - 4} bytes)"}})
        buf[:4] = np.frombuffer(len(raw).to_bytes(4, "little"), np.uint8)
        buf[4:4 + len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int.from_bytes(out[:4].tobytes(), "little")
    wrapped = pickle.loads(out[4:4 + n].tobytes())
    if wrapped["seq"] != _seq:
        raise RuntimeError(
            f"HPO broadcast desync: process {jax.process_index()} expected "
            f"message #{_seq} but leader sent #{wrapped['seq']}")
    _seq += 1
    msg = wrapped["msg"]
    if isinstance(msg, dict) and "error" in msg:
        raise ValueError(msg["error"])
    return msg


def broadcast_params(overrides: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Process-0's trial params, on every process. Single-process: identity."""
    if jax.process_count() == 1:
        return overrides or {}
    return _broadcast_obj(overrides or {})


def broadcast_flag(flag: bool) -> bool:
    """Process-0's boolean decision (e.g. should_prune), on every process.
    Rides the same fixed-shape object broadcast as every other message."""
    if jax.process_count() == 1:
        return flag
    msg = _broadcast_obj({"kind": "prune", "flag": bool(flag)})
    return _follower_prune_msg(msg)


def _follower_prune_msg(msg: Dict[str, Any]) -> bool:
    """Interpret a message received at a prune checkpoint. A non-prune
    message means the leader abandoned the trial (leader-local failure at an
    epoch boundary — RDB write, checkpoint I/O) and has already moved on:
    stash it for the announce loop and abort this trial on every process."""
    global _pending
    if isinstance(msg, dict) and msg.get("kind") == "prune":
        return msg["flag"]
    if isinstance(msg, dict) and msg.get("kind") == "abort":
        raise TrialAborted(msg.get("reason", "leader-side trial failure"))
    _pending = msg
    raise TrialAborted("leader moved on to the next announce mid-trial")


class SyncedTrial:
    """Wraps an optuna/fallback trial so pruning decisions are made on
    process 0 and broadcast — every process stops a pruned trial after the
    SAME epoch (the reference lets non-rank-0 workers run to completion,
    main.py:455-460, which would deadlock a GSPMD mesh)."""

    def __init__(self, inner=None):
        self.inner = inner  # None on follower processes
        self.number = inner.number if inner is not None else -1
        self.params = getattr(inner, "params", {})

    def report(self, value: float, step: int) -> None:
        if self.inner is not None:
            self.inner.report(value, step)

    def should_prune(self) -> bool:
        local = self.inner.should_prune() if self.inner is not None else False
        return broadcast_flag(local)


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
    follower_count = iter(range(10 ** 9))
    multi = jax.process_count() > 1

    def _run_trial_cfg(overrides, number, trial) -> float:
        trial_cfg = dataclasses.replace(
            cfg, nEpochs=cfg.opt_num_epochs, use_optuna=False,
            experiment_folder=os.path.join(
                cfg.experiment_folder or ".", f"trial_{number}"),
            **overrides)
        trainer = Trainer(trial_cfg)
        trainer.optuna_trial = SyncedTrial(trial)
        metrics = trainer.training()
        return _objective_value(cfg, metrics, trainer)

    def train_trial(trial) -> float:
        # only process 0 draws params; every process trains the same config.
        # The leader announces each trial as {kind: trial, params}; the end
        # of the study is a {kind: stop} sentinel, so the follower loop can
        # NEVER drift from the leader's trial count (a leader-only failure
        # before the announce simply skips to the next announce).
        # the announce carries trial.number so follower trial_N artifact
        # folders always mirror the leader's numbering, even after a
        # leader-side pre-announce failure skipped a number
        overrides = _suggest(trial, cfg)
        if multi:
            msg = _broadcast_obj({"kind": "trial", "stop": False,
                                  "params": overrides,
                                  "number": trial.number})
            overrides = msg["params"]
        try:
            return _run_trial_cfg(overrides, trial.number, trial)
        except Exception as e:
            # leader-local failure mid-trial (RDB write, checkpoint I/O —
            # anything at an epoch boundary): tell the followers, who are
            # sitting at their next prune checkpoint, to abandon the trial
            # too, then let the study handle/record the failure. Pruned
            # trials need no abort — the prune flag already stopped every
            # process at the same epoch.
            if multi and type(e).__name__ not in ("TrialPruned", "_Pruned"):
                _broadcast_obj({"kind": "abort", "reason": repr(e)})
            raise

    if multi and jax.process_index() != 0:
        # follower loop (reference main.py:455-460): run every announced
        # trial until the stop sentinel; pruning and leader-side aborts
        # arrive via the SyncedTrial broadcast
        global _pending
        while True:
            if _pending is not None:
                msg, _pending = _pending, None
            else:
                msg = _broadcast_obj(None)
            if not isinstance(msg, dict) or msg.get("kind") == "abort":
                continue  # stale abort for an already-abandoned trial
            if msg.get("stop", False):
                break
            try:
                _run_trial_cfg(msg["params"],
                               msg.get("number", next(follower_count)), None)
            except TrialAborted as e:
                print(f"follower trial aborted by leader: {e}")
            except Exception as e:
                if type(e).__name__ not in ("TrialPruned", "_Pruned"):
                    print(f"follower trial failed: {e}")
        return {}

    try:
        try:
            import optuna
        except ImportError:
            return _fallback_random_search(cfg, train_trial)
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
    finally:
        if multi and jax.process_index() == 0:
            _broadcast_obj({"kind": "trial", "stop": True})


class _FallbackTrial:
    """Minimal optuna.Trial stand-in: suggest_* + report/should_prune with
    optuna MedianPruner semantics (reference main.py:453 uses the default
    MedianPruner): no pruning until ``n_startup_trials`` trials COMPLETED
    (optuna default 5) and the trial has passed ``n_warmup_steps`` (default
    0); then prune when the trial's BEST intermediate value so far is worse
    than the median of completed trials' intermediate values at this step."""

    N_STARTUP_TRIALS = 5   # optuna.pruners.MedianPruner defaults
    N_WARMUP_STEPS = 0

    def __init__(self, number: int, rng: np.random.Generator,
                 history: Dict[int, Dict[int, float]], maximize: bool,
                 completed: Optional[set] = None):
        self.number = number
        self._rng = rng
        self._history = history
        self._completed = completed if completed is not None else set()
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
        step = max(self._reports)
        if step < self.N_WARMUP_STEPS:
            return False
        peers = [n for n in self._completed if n != self.number]
        if len(peers) < self.N_STARTUP_TRIALS:
            return False
        at_step = [self._history[n][step] for n in peers
                   if step in self._history.get(n, {})]
        if not at_step:
            return False
        med = float(np.median(at_step))
        best = (max if self._maximize else min)(self._reports.values())
        return best < med if self._maximize else best > med


class _Pruned(Exception):
    pass


def _fallback_random_search(cfg, train_trial) -> Dict[str, Any]:
    maximize = cfg.fine_tune_task == "binary_classification"
    rng = np.random.default_rng(cfg.seed)
    history: Dict[int, Dict[int, float]] = {}
    completed: set = set()
    best_value = -np.inf if maximize else np.inf
    best_params: Dict[str, Any] = {}
    for n in range(cfg.num_trials):
        trial = _FallbackTrial(n, rng, history, maximize, completed)
        try:
            value = train_trial(trial)
        except Exception as e:  # pruned or failed trial
            if type(e).__name__ not in ("TrialPruned", "_Pruned"):
                print(f"trial {n} failed: {e}")
            continue
        completed.add(n)
        better = value > best_value if maximize else value < best_value
        if better:
            best_value, best_params = value, dict(trial.params)
    _dump_best(cfg, best_params, best_value)
    return {"best_value": best_value, **best_params}


# ---------------------------------------------------------------------------
# Best-param reload (reference main.py:501-522: --use_best_params_from_optuna
# re-reads the finished study's best params — lr, gamma, ... — into a full
# training run)
# ---------------------------------------------------------------------------

def load_best_params(cfg) -> Dict[str, Any]:
    """Find the newest ``best_params.pkl`` for this experiment: the run's own
    folder first, then ``<base>/experiments/*<exp_name>*/``."""
    candidates = []
    if cfg.experiment_folder:
        candidates += glob.glob(os.path.join(cfg.experiment_folder,
                                             "best_params.pkl"))
    candidates += glob.glob(os.path.join(cfg.base_path, "experiments",
                                         f"*{cfg.exp_name}*",
                                         "best_params.pkl"))
    if not candidates:
        return {}
    path = max(candidates, key=os.path.getmtime)
    with open(path, "rb") as f:
        params = pickle.load(f)
    print(f"[hpo] loaded best params from {path}: {params}")
    return params


def apply_best_params(cfg):
    """Overlay the tuned params onto the config (reference main.py:501-522;
    'gamma' there is lr_gamma here — the decay special-cased at 514-517)."""
    params = load_best_params(cfg)
    if not params:
        print("[hpo] use_best_params_from_optuna set but no best_params.pkl "
              "found — training with the configured defaults")
        return cfg
    fields = {f.name for f in dataclasses.fields(type(cfg))}
    params = {k: v for k, v in params.items() if k in fields}
    return dataclasses.replace(cfg, **params).validate()
