"""Observability: loss histories, CSV dumps, TensorBoard/wandb sinks.

Replaces the reference's Writer (reference loss_writer.py:19-160):
  * per-loss running windows truncated to ``running_mean_size``
    (loss_writer.py:147-155; main.py:73 default 5000);
  * ``loss_summary`` — running mean -> history -> TensorBoard scalar
    (loss_writer.py:58-73);
  * ``save_history_to_csv`` — zip_longest of every history into
    full_scores.csv (loss_writer.py:48-55);
  * per-subject prediction text files per eval iteration
    (loss_writer.py:91-93);
  * wandb registration per epoch (loss_writer.py:130-145), gated and
    import-safe when wandb/tensorboard are unavailable.
"""

from __future__ import annotations

import csv
import os
from collections import defaultdict
from itertools import zip_longest
from typing import Dict, List, Optional


class Writer:
    def __init__(self, log_dir: str, sets: List[str],
                 running_mean_size: int = 5000,
                 use_tensorboard: bool = False, use_wandb: bool = False,
                 wandb_kwargs: Optional[Dict] = None):
        self.log_dir = log_dir
        self.sets = sets
        self.running_mean_size = running_mean_size
        self.loss_values: Dict[str, List] = defaultdict(list)  # (value, weight)
        self.loss_history: Dict[str, List[float]] = defaultdict(list)
        self.metric_history: Dict[str, List[float]] = defaultdict(list)
        self.current_metrics: Dict[str, float] = {}
        self.eval_iter = 0
        self.total_train_steps = 0
        os.makedirs(log_dir, exist_ok=True)
        self.per_subject_dir = os.path.join(log_dir, "per_subject_predictions")
        os.makedirs(self.per_subject_dir, exist_ok=True)

        self.tensorboard = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tensorboard = SummaryWriter(log_dir=log_dir)
            except Exception:
                self.tensorboard = None
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(dir=log_dir, **(wandb_kwargs or {}))
                self.wandb = wandb
            except Exception:
                self.wandb = None

    # -- losses ---------------------------------------------------------------
    def write_losses(self, loss_dict: Dict[str, float], set_name: str,
                     weight: float = 1.0) -> None:
        """Append per-step loss values (loss_writer.py:147-155). ``weight``
        down-weights padded eval tail batches (valid-sample fraction) so the
        duplicated pad slots don't bias the loss averages that feed
        regression BEST-checkpoint selection and the optuna objective."""
        for name, value in loss_dict.items():
            key = f"{name}_{set_name}"
            vals = self.loss_values[key]
            vals.append((value, weight))  # device scalar; synced at summary
            if set_name == "train":
                del vals[:-self.running_mean_size]
        if set_name == "train":
            self.total_train_steps += 1

    def loss_summary(self, lr: float = 0.0) -> Dict[str, float]:
        """Running means -> history -> scalar sinks (loss_writer.py:58-73).
        Recorded values may be device scalars; they are materialized in ONE
        batched transfer here (per-value float() would be one RPC each on
        the tunneled backend)."""
        out: Dict[str, float] = {}
        self.metric_history["lr"].append(lr)
        try:
            import jax
            fetched = jax.device_get(dict(self.loss_values))
            self.loss_values = defaultdict(list, fetched)
        except Exception:
            pass
        for key, vals in self.loss_values.items():
            if not vals:
                continue
            wsum = sum(w for _, w in vals)
            mean = float(sum(float(v) * w for v, w in vals)
                         / max(wsum, 1e-12))
            self.loss_history[f"{key}_loss_history"].append(mean)
            out[key] = mean
            self._scalar(f"loss/{key}", mean, len(self.loss_history[
                f"{key}_loss_history"]))
        # eval windows reset each summary; train keeps its running window
        for key in list(self.loss_values):
            if not key.endswith("_train"):
                self.loss_values[key] = []
        return out

    def write_norms(self, norms: Dict[str, float], step: int) -> None:
        """Per-module parameter/gradient norms — the wandb.watch equivalent
        (reference trainer.py:94-97). Lands in TB, wandb, and the
        full_scores.csv history."""
        payload = {}
        for name, value in norms.items():
            v = float(value)
            payload[f"norm/{name}"] = v
            self.metric_history[f"norm/{name}"].append(v)
            self._scalar(f"norms/{name}", v, step)
        if self.wandb is not None:
            self.wandb.log({"step": step, **payload})

    # -- metrics ----------------------------------------------------------------
    def record_metrics(self, metrics: Dict[str, float]) -> None:
        self.current_metrics = dict(metrics)
        for name, value in metrics.items():
            self.metric_history[name].append(value)
            self._scalar(f"metrics/{name}", value, self.eval_iter)
            print(f"{name}: {value}")
        self.eval_iter += 1

    def write_subject_predictions(self, accumulator) -> None:
        """Per-subject prediction dump (loss_writer.py:91-93)."""
        path = os.path.join(self.per_subject_dir,
                            f"iter_{self.eval_iter}.txt")
        with open(path, "a+") as f:
            for mode in self.sets:
                subs, means, stds, truths = accumulator.per_subject(mode)
                for s, m, sd, t in zip(subs, means, stds, truths):
                    f.write(f"subject:{s} ({mode})\n"
                            f"outputs: {m:.4f}±{sd:.4f}  -  truth: {t}\n")

    def save_history_to_csv(self) -> str:
        """full_scores.csv via zip_longest (loss_writer.py:48-55)."""
        rows = {**self.loss_history, **self.metric_history}
        path = os.path.join(self.log_dir, "full_scores.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            keys = list(rows)
            w.writerow(keys)
            for tup in zip_longest(*[rows[k] for k in keys], fillvalue=""):
                w.writerow(tup)
        return path

    def register_wandb(self, epoch: int, lr: float) -> None:
        if self.wandb is None:
            return
        payload = {"epoch": epoch, "lr": lr}
        for key, hist in self.loss_history.items():
            if hist:
                payload[key] = hist[-1]
        payload.update(self.current_metrics)
        self.wandb.log(payload)

    def _scalar(self, tag: str, value: float, step: int) -> None:
        if self.tensorboard is not None:
            self.tensorboard.add_scalar(tag, value, step)
