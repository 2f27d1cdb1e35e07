"""Checkpointing: best-metric save policy, auto-resume, partial restore.

Replaces the reference's torch .pth checkpointing (reference
trainer.py:623-690 save policy, 107-162 resume, model.py:90-151 partial
load) with a flax-msgpack store:

  * ``save_checkpoint``/``load_checkpoint`` — full train state (params,
    opt_state, step, epoch, best metrics, the frozen g-mean validation
    threshold — trainer.py:654-658) in one file.
  * best-file policy: ``*_BEST_val_AUROC`` on AUROC improvement, secondary
    ``*_BEST_val_accuracy``, ``*_BEST_val_loss`` for regression
    (trainer.py:660-690).
  * ``latest_checkpoint`` — newest file by mtime for crash auto-resume
    (trainer.py:107-116 ``_sort_pth_files``).
  * ``partial_restore`` — the cross-phase transfer mechanism
    (model.py:90-108): copy every leaf whose path+shape matches, skip
    position embeddings on shape mismatch, optionally skip the CLS embedding
    (``load_cls_embedding``).
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, params, opt_state=None, step: int = 0,
                    epoch: int = 0, metadata: Optional[Dict[str, Any]] = None
                    ) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": serialization.to_bytes(_to_host(params)),
        "opt_state": (serialization.to_bytes(_to_host(opt_state))
                      if opt_state is not None else None),
        "step": int(step),
        "epoch": int(epoch),
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, params_template, opt_state_template=None
                    ) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    out: Dict[str, Any] = {
        "step": payload["step"], "epoch": payload["epoch"],
        "metadata": payload.get("metadata", {}),
    }
    out["params"] = serialization.from_bytes(params_template,
                                             payload["params"])
    if opt_state_template is not None and payload.get("opt_state") is not None:
        try:
            out["opt_state"] = serialization.from_bytes(
                opt_state_template, payload["opt_state"])
        except Exception as e:
            # opt_state pytree structure changed across versions (e.g. the
            # fused-optimizer or optax.flatten switch). Do NOT silently
            # resume with fresh moments — surface the incompatibility so the
            # caller can rebuild a compatible optimizer (Trainer retries
            # with fused='off') or fail loudly: a quiet restart of Adam
            # moments AND the schedule count mid-run changes training
            # dynamics (round-4 advisor, medium).
            out["opt_state_error"] = str(e)
            print(f"[ckpt] opt_state incompatible with current optimizer "
                  f"({e})")
    return out


def load_metadata(path: str) -> Dict[str, Any]:
    """Read only a checkpoint's metadata dict."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload.get("metadata", {})


def load_raw_params(path: str):
    """Load a checkpoint's params as a plain nested dict (no template) —
    needed for partial restore across architectures."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return serialization.msgpack_restore(payload["params"])


def latest_checkpoint(folder: str, pattern: str = "*.ckpt") -> Optional[str]:
    files = glob.glob(os.path.join(folder, pattern))
    if not files:
        return None
    return max(files, key=os.path.getmtime)


def partial_restore(target_params, source_params, *,
                    load_cls_embedding: bool = True,
                    verbose: bool = False) -> Tuple[Any, Dict[str, int]]:
    """Merge ``source_params`` into ``target_params`` by key path.

    Rules (model.py:90-108):
      * leaf copied only when the full path exists in the target AND shapes
        match; mismatches are skipped (position embeddings differ across
        phases when sequence lengths change);
      * CLS-embedding leaves skipped unless ``load_cls_embedding``.
    Returns (merged_params, stats dict).
    """
    tgt = flatten_dict(serialization.to_state_dict(target_params))
    src = flatten_dict(serialization.to_state_dict(source_params))
    stats = {"copied": 0, "shape_skipped": 0, "missing": 0, "cls_skipped": 0}
    merged = dict(tgt)
    for key, val in src.items():
        path = "/".join(map(str, key))
        if key not in tgt:
            stats["missing"] += 1
            continue
        if not load_cls_embedding and "cls_embedding" in path:
            stats["cls_skipped"] += 1
            continue
        if np.shape(tgt[key]) != np.shape(val):
            stats["shape_skipped"] += 1
            if verbose:
                print(f"[partial_restore] shape skip {path}: "
                      f"{np.shape(val)} -> {np.shape(tgt[key])}")
            continue
        merged[key] = val
        stats["copied"] += 1
    restored = serialization.from_state_dict(target_params,
                                             unflatten_dict(merged))
    return restored, stats


class BestCheckpointPolicy:
    """Best-val save policy (trainer.py:660-690)."""

    def __init__(self, folder: str, title: str,
                 fine_tune_task: str = "binary_classification"):
        self.folder = folder
        self.title = title
        self.task = fine_tune_task
        self.best_auroc = 0.0
        self.best_acc = 0.0
        self.best_loss = float("inf")
        os.makedirs(folder, exist_ok=True)

    def resume(self) -> None:
        """Restore best-so-far metrics from BEST files already on disk
        (reference trainer.py:145 restores best_loss on resume), so a
        post-crash epoch cannot overwrite a better pre-crash BEST
        checkpoint with a worse one."""
        for fname, attr, better in (
                (f"{self.title}_BEST_val_AUROC.ckpt", "best_auroc", max),
                (f"{self.title}_BEST_val_accuracy.ckpt", "best_acc", max),
                (f"{self.title}_BEST_val_loss.ckpt", "best_loss", min)):
            path = os.path.join(self.folder, fname)
            if not os.path.exists(path):
                continue
            val = load_metadata(path).get(attr)
            if val is not None:
                setattr(self, attr, better(getattr(self, attr), float(val)))

    def update(self, *, val_auroc: Optional[float] = None,
               val_acc: Optional[float] = None,
               val_loss: Optional[float] = None, **save_kwargs) -> Optional[str]:
        """Save if a tracked metric improved; returns the path written."""
        meta = save_kwargs.setdefault("metadata", {})
        meta.update(best_auroc=self.best_auroc, best_acc=self.best_acc,
                    best_loss=self.best_loss)
        if self.task == "regression":
            if val_loss is not None and val_loss < self.best_loss:
                self.best_loss = val_loss
                meta["best_loss"] = val_loss
                return save_checkpoint(os.path.join(
                    self.folder, f"{self.title}_BEST_val_loss.ckpt"),
                    **save_kwargs)
            return None
        wrote = None
        if val_auroc is not None and val_auroc > self.best_auroc:
            self.best_auroc = val_auroc
            meta["best_auroc"] = val_auroc
            wrote = save_checkpoint(os.path.join(
                self.folder, f"{self.title}_BEST_val_AUROC.ckpt"),
                **save_kwargs)
        # track best_acc EVERY epoch (an all-time-best accuracy that
        # coincides with an AUROC improvement must still raise the bar);
        # the secondary accuracy FILE is only written when AUROC didn't
        # improve (reference trainer.py:660-690 policy)
        if val_acc is not None and val_acc > self.best_acc:
            self.best_acc = val_acc
            meta["best_acc"] = val_acc
            if wrote is None:
                wrote = save_checkpoint(os.path.join(
                    self.folder, f"{self.title}_BEST_val_accuracy.ckpt"),
                    **save_kwargs)
        return wrote
