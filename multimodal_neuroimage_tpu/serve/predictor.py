"""Production inference: checkpoint -> per-subject predictions.

The reference's only inference path is phase 4 (``--step 4``), which
evaluates the labeled TEST SPLIT with metrics (reference main.py:569-590,
trainer.py:571-582); scoring new, unlabeled subjects required code edits.
This module serves that case first-class: ``Predictor`` loads a trained
checkpoint, builds the jitted deterministic forward once (autoplan-resolved
fused kernels, bf16 policy, batch sharded over the mesh), streams any
cohort through the prefetching pipeline, ensembles repeated windows per
subject (loss_writer.py:75-128 semantics), applies the checkpoint's frozen
validation threshold (metrics.py:21-33) for hard labels, and writes
``predictions.csv``.

Unlabeled cohorts: ``build_subject_index(cfg, require_target=False)``
keeps subjects whose target is missing/NA (scored with a dummy target the
model never reads in deterministic forward mode).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_neuroimage_tpu.ckpt.checkpoint import (latest_checkpoint,
                                                       load_metadata,
                                                       load_raw_params)
from multimodal_neuroimage_tpu.data.index import build_subject_index
from multimodal_neuroimage_tpu.data.loader import DataPipeline
from multimodal_neuroimage_tpu.parallel.mesh import (
    maybe_initialize_distributed, mesh_for_batch, replicate)
from multimodal_neuroimage_tpu.models.registry import create_model
from multimodal_neuroimage_tpu.train.state import (_batch_pspecs, _cast_tree,
                                                   use_shard_map)


def make_predict_step(model, compute_dtype: str = "bfloat16", mesh=None,
                      spmd: str = "auto", data_axis: str = "data"):
    """Deterministic forward returning only the prediction heads — no
    losses, so unlabeled batches work. Multi-chip TPU meshes run through
    ``shard_map`` like make_eval_step (train/state.py): GSPMD cannot
    partition a ``pallas_call``, so plain jit would gather the fused
    kernels' operands onto every chip."""
    cdtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    from multimodal_neuroimage_tpu.train.state import _set_fusion_stream_policy
    _set_fusion_stream_policy(cdtype)
    shard = use_shard_map(spmd, mesh, data_axis)

    def core(params, batch):
        p = _cast_tree(params, cdtype)
        b = _cast_tree(batch, cdtype)
        outputs = model.apply({"params": p}, b, deterministic=True)
        return {k: outputs[k].astype(jnp.float32)
                for k in ("binary_classification", "regression")
                if k in outputs}

    from functools import partial

    from multimodal_neuroimage_tpu.train.state import tpu_compiler_options

    @partial(jax.jit, compiler_options=tpu_compiler_options())
    def predict_step(params, batch):
        f = core
        if shard:
            from jax.sharding import PartitionSpec as P
            f = jax.shard_map(core, mesh=mesh,
                              in_specs=(P(), _batch_pspecs(batch, data_axis)),
                              out_specs=P(data_axis), check_vma=False)
        return f(params, batch)

    return predict_step


def _global_reduce(sums: np.ndarray, counts: np.ndarray):
    """Sum fixed-shape per-record (sum, count) arrays over all processes
    (no-op single-process). Exercised across real processes by
    scripts/multihost_rehearsal.py."""
    if jax.process_count() > 1:
        from multimodal_neuroimage_tpu.parallel.mesh import process_allgather
        pc = jax.process_count()
        sums = process_allgather(sums).reshape(pc, -1).sum(axis=0)
        counts = process_allgather(counts).reshape(pc, -1).sum(axis=0)
    return sums, counts


class Predictor:
    """Load once, predict many."""

    def __init__(self, cfg, checkpoint: Optional[str] = None,
                 records: Optional[List] = None,
                 require_target: bool = False):
        from multimodal_neuroimage_tpu.ops.autoplan import resolve_plans
        maybe_initialize_distributed(cfg.distributed)
        resolve_plans(cfg.batch_size)
        self.cfg = cfg
        self.mesh = mesh_for_batch(cfg)
        self.model = create_model(cfg)
        if records is None:
            records = build_subject_index(cfg, require_target=require_target)
        self.records = records
        self.pipe = DataPipeline(cfg, mesh=self.mesh, records=records)
        path = checkpoint or self._default_checkpoint()
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint found in {cfg.experiment_folder!r}; pass "
                f"checkpoint= or set cfg.model_weights_path")
        self.checkpoint_path = path
        self.params = replicate(load_raw_params(path), self.mesh)
        meta = load_metadata(path)
        self.threshold = float(meta.get("val_threshold") or 0.5)
        self._step = make_predict_step(self.model, cfg.compute_dtype,
                                       mesh=self.mesh,
                                       spmd=getattr(cfg, "spmd_mode", "auto"))
        self.head = ("regression"
                     if cfg.fine_tune_task == "regression"
                     else "binary_classification")

    def _default_checkpoint(self) -> Optional[str]:
        cfg = self.cfg
        if cfg.model_weights_path:
            return cfg.model_weights_path
        folder = cfg.experiment_folder
        if not folder:
            return None
        title = cfg.experiment_title or cfg.exp_name
        order = (("BEST_val_loss",)
                 if cfg.fine_tune_task == "regression"
                 else ("BEST_val_AUROC", "BEST_val_accuracy"))
        for best in order:
            preferred = os.path.join(folder, f"{title}_{best}.ckpt")
            if os.path.exists(preferred):
                return preferred
        # any BEST checkpoint beats the rolling *_last_epoch.ckpt crash-
        # recovery file, which is always the mtime-newest after training
        import glob as _glob
        bests = _glob.glob(os.path.join(folder, "*BEST*.ckpt"))
        if bests:
            return max(bests, key=os.path.getmtime)
        fallback = latest_checkpoint(folder)
        if fallback is not None:
            print(f"[predict] WARNING: no BEST checkpoint in {folder!r}; "
                  f"serving {os.path.basename(fallback)} (likely last-epoch "
                  f"weights, not validation-selected)")
        return fallback

    def predict(self, write_csv: Optional[str] = None
                ) -> Dict[str, Dict[str, float]]:
        """Score every record; returns {subject: {"score", "label"?}} with
        repeated windows per subject mean-ensembled. Classification scores
        are sigmoid probabilities; "label" thresholds them at the
        checkpoint's frozen g-mean validation threshold.

        Multi-host: each process scores its pipeline shard; per-subject
        (sum, count) are reduced over a fixed-shape record-index array via
        ``process_allgather``, so every process returns the FULL cohort
        (same global-metrics discipline as evaluation/metrics.py).

        Ensembling matches evaluation exactly (metrics.py per_subject /
        reference loss_writer.py:85-90): classification sigmoids EACH
        window's logit and averages the probabilities — the frozen
        val_threshold was fit on mean-of-sigmoids, so sigmoid-of-mean-logit
        would label subjects inconsistently with phase-4 testing."""
        self.pipe.splits["predict"] = list(self.records)
        pos = {str(r.subject): i for i, r in enumerate(self.records)}
        sums = np.zeros(len(self.records), np.float64)
        counts = np.zeros(len(self.records), np.float64)
        classify = self.head == "binary_classification"
        for batch, names in self.pipe.epoch("predict", shuffle=False):
            vals = np.asarray(
                self._step(self.params, batch)[self.head]).reshape(-1)
            if classify:
                vals = 1.0 / (1.0 + np.exp(-vals))   # per-window sigmoid
            for name, v in zip(names, vals):
                if name is None:        # tail padding
                    continue
                i = pos[str(name)]
                sums[i] += float(v)
                counts[i] += 1.0
        sums, counts = _global_reduce(sums, counts)
        out: Dict[str, Dict[str, float]] = {}
        for i, rec in enumerate(self.records):
            if counts[i] == 0:          # dropped by global drop_last
                continue
            subject = str(rec.subject)
            mean = float(sums[i] / counts[i])
            if classify:
                out[subject] = {"score": mean,
                                "label": float(mean > self.threshold)}
            else:
                out[subject] = {"score": mean}
        if write_csv and jax.process_index() == 0:
            self._write_csv(write_csv, out)
        return out

    def _write_csv(self, path: str, out: Dict[str, Dict[str, float]]) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        cols = ["subject", "score"] + (
            ["label"] if self.head == "binary_classification" else [])
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for subject in sorted(out):
                w.writerow([subject] + [out[subject][c] for c in cols[1:]])


def run_predict(cfg) -> Dict[str, Dict[str, float]]:
    """CLI entry (``--predict_only``): score the full cohort and write
    predictions.csv into the experiment folder."""
    pred = Predictor(cfg)
    dest = os.path.join(cfg.experiment_folder or ".", "predictions.csv")
    out = pred.predict(write_csv=dest)
    print(f"[predict] {len(out)} subjects -> {dest} "
          f"(checkpoint {pred.checkpoint_path}, "
          f"threshold {pred.threshold:.4f})")
    return out
