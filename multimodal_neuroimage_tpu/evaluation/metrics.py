"""Classification / regression metrics + subject-level aggregation.

Host-side (numpy/sklearn) replacement for the reference's Metrics class
(reference metrics.py:1-66) and the Writer's subject aggregation
(reference trainer.py:756-778, loss_writer.py:75-128):

  * every forward appends each subject's window score; at summary time,
    classification scores are sigmoided and averaged per subject (window
    ensemble), then AUROC / balanced & raw accuracy / g-mean-optimal
    threshold / specificity / sensitivity / F1 are computed per split;
  * regression reports MAE / MSE / NMSE / R^2 on the per-subject means;
  * at test time, the decision threshold is FROZEN from validation
    (metrics.py:21-33 — the threshold travels through the checkpoint).

Unlike the reference — which aggregated per-rank only (SURVEY §5.8) — the
accumulator gathers (subject, score, truth) across processes before scoring.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
from sklearn.metrics import (balanced_accuracy_score, f1_score, r2_score,
                             recall_score, roc_auc_score, roc_curve)

from multimodal_neuroimage_tpu.parallel.mesh import process_allgather


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))


def bac(truth, pred) -> float:
    return float(balanced_accuracy_score(truth, pred))


def rac(truth, pred) -> float:
    """Raw accuracy (metrics.py:13-14)."""
    truth, pred = np.asarray(truth), np.asarray(pred)
    return float(np.mean(truth == pred))


def auroc(truth, score) -> float:
    return float(roc_auc_score(truth, score))


def roc_threshold_metrics(truth, score, *, frozen_threshold: Optional[float]
                          = None) -> Dict[str, float]:
    """g-mean-optimal operating point (metrics.py:21-51). When
    ``frozen_threshold`` is given (test mode) it is applied instead of
    re-optimizing."""
    truth = np.asarray(truth)
    score = np.asarray(score)
    if frozen_threshold is not None:
        pred = score > frozen_threshold
        tpr = recall_score(truth, pred, pos_label=1)
        tnr = recall_score(truth, pred, pos_label=0)
        fpr = 1.0 - tnr
        best = dict(threshold=float(frozen_threshold),
                    gmean=float(np.sqrt(tpr * (1 - fpr))),
                    specificity=float(1 - fpr), sensitivity=float(tpr))
    else:
        fpr, tpr, thresholds = roc_curve(truth, score)
        gmeans = np.sqrt(tpr * (1 - fpr))
        ix = int(np.argmax(gmeans))
        best = dict(threshold=float(thresholds[ix]), gmean=float(gmeans[ix]),
                    specificity=float(1 - fpr[ix]), sensitivity=float(tpr[ix]))
        pred = score > best["threshold"]
    best["f1_score"] = float(f1_score(truth, pred))
    best["best_bal_acc"] = bac(truth, pred)
    return best


def gather_ragged(v: np.ndarray) -> np.ndarray:
    """Concatenate per-process 1-D arrays of DIFFERENT lengths across all
    processes. ``multihost_utils.process_allgather`` requires identical
    shapes, but hosts legitimately disagree here: the padded eval tail
    batch leaves different valid-subject counts per host. Lengths are
    gathered first, values NaN-padded to the max, gathered, and trimmed.
    Single-process: identity. Exercised across two real processes in
    scripts/multihost_rehearsal.py."""
    import jax
    pc = jax.process_count()
    v = np.asarray(v).reshape(-1)
    if pc == 1:
        return v
    lengths = process_allgather(
        np.asarray([len(v)], np.int64)).reshape(-1)
    m = int(lengths.max()) if len(lengths) else 0
    if m == 0:
        return v
    padded = np.full(m, np.nan, np.float64)
    padded[:len(v)] = v
    stacked = process_allgather(padded).reshape(pc, m)
    return np.concatenate([stacked[i, :int(lengths[i])]
                           for i in range(pc)])


def regression_metrics(truth, pred) -> Dict[str, float]:
    truth = np.asarray(truth, dtype=np.float64)
    pred = np.asarray(pred, dtype=np.float64)
    return {
        "MAE": float(np.mean(np.abs(pred - truth))),
        "MSE": float(np.mean((pred - truth) ** 2)),
        # per-element form for reference parity (metrics.py:61-63); the
        # eps guard only prevents inf on z-scored targets that are
        # EXACTLY 0 — note the reference metric is inherently unstable
        # for |truth| near 0 (a sum-ratio NMSE would be robust)
        "NMSE": float(np.mean((pred - truth) ** 2
                              / np.maximum(truth ** 2, 1e-12))),
        "R2_score": float(r2_score(truth, pred)),
    }


@dataclass
class SubjectAccumulator:
    """Per-subject window-score accumulation (trainer.py:756-778)."""

    fine_tune_task: str = "binary_classification"
    scores: Dict[str, List[float]] = field(default_factory=dict)
    truths: Dict[str, float] = field(default_factory=dict)
    modes: Dict[str, str] = field(default_factory=dict)

    def append(self, subjects, scores, truths, mode: str) -> None:
        scores = np.asarray(scores).reshape(-1)
        truths = np.asarray(truths).reshape(-1)
        for subj, sc, tr in zip(np.asarray(subjects).reshape(-1), scores, truths):
            key = str(subj)
            self.scores.setdefault(key, []).append(float(sc))
            self.truths[key] = float(tr)
            self.modes[key] = mode

    def reset(self, keep_mode: Optional[str] = None) -> None:
        """Clear accumulated subjects; ``keep_mode`` preserves one split
        (mid-epoch val keeps 'train' — loss_writer.py:125-128)."""
        if keep_mode is None:
            self.scores, self.truths, self.modes = {}, {}, {}
            return
        keep = {k for k, m in self.modes.items() if m == keep_mode}
        self.scores = {k: v for k, v in self.scores.items() if k in keep}
        self.truths = {k: v for k, v in self.truths.items() if k in keep}
        self.modes = {k: v for k, v in self.modes.items() if k in keep}

    def per_subject(self, mode: str):
        """(subjects, mean scores, stds, truths) for one split. Scores are
        sigmoided per window before averaging for classification
        (loss_writer.py:81-87)."""
        subjects, means, stds, truths = [], [], [], []
        for subj, vals in self.scores.items():
            if self.modes[subj] != mode:
                continue
            v = np.asarray(vals, dtype=np.float64)
            if self.fine_tune_task == "binary_classification":
                v = sigmoid(v)
            subjects.append(subj)
            means.append(float(v.mean()))
            stds.append(float(v.std()))
            truths.append(self.truths[subj])
        return subjects, np.asarray(means), np.asarray(stds), np.asarray(truths)

    def summary(self, modes, *, val_threshold: Optional[float] = None
                ) -> Dict[str, float]:
        """Global metric summary per split (loss_writer.py:95-123). Subject
        rows are allgathered across processes first (fixes the reference's
        shard-local metrics, SURVEY §5.8)."""
        metrics: Dict[str, float] = {}
        for mode in modes:
            subs, pred, _, truth = self.per_subject(mode)
            pred = gather_ragged(pred)
            truth = gather_ragged(truth)
            if len(pred) == 0:
                continue
            if self.fine_tune_task == "regression":
                for k, v in regression_metrics(truth, pred).items():
                    metrics[f"{mode}_{k}"] = v
            else:
                hard = pred > 0.5
                metrics[f"{mode}_Balanced_Accuracy"] = bac(truth, hard)
                metrics[f"{mode}_Regular_Accuracy"] = rac(truth, hard)
                if len(np.unique(truth)) > 1:
                    metrics[f"{mode}_AUROC"] = auroc(truth, pred)
                    frozen = val_threshold if mode == "test" else None
                    best = roc_threshold_metrics(truth, pred,
                                                 frozen_threshold=frozen)
                    metrics[f"{mode}_best_bal_acc"] = best["best_bal_acc"]
                    metrics[f"{mode}_best_threshold"] = best["threshold"]
                    metrics[f"{mode}_gmean"] = best["gmean"]
                    metrics[f"{mode}_specificity"] = best["specificity"]
                    metrics[f"{mode}_sensitivity"] = best["sensitivity"]
                    metrics[f"{mode}_f1_score"] = best["f1_score"]
        return metrics
