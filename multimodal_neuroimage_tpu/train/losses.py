"""Loss library + per-task activation registry.

Re-implements the reference's loss zoo (reference losses.py, registry at
loss_writer.py:162-201) as pure, vectorized jnp functions. The reference
computes several of these with O(T^2)/O(B^2) Python loops on GPU tensors
(Cont_Loss losses.py:128-156, Merge_Loss 190-219, Mask_Loss 223-279); here
each is a single batched expression XLA fuses onto the VPU/MXU.

Activation rules (loss_writer.py:181-201):
  * task contains 'reconstruction'  -> perceptual + reconstruction
      (+ contrastive / mask when 'tran' in task and the flag is set)
  * task in {lowfreqBERT, 2DBERT, FuncStruct} -> merge (flag), unet (flag),
      and binary_classification OR regression by fine_tune_task
  * task in {test, VIT, SwinFusion} -> binary_classification OR regression

Known reference bugs NOT copied (SURVEY §2.3: implement intended behavior):
  * Mask_Loss only accumulated the LAST batch element into the total
    (losses.py:272 sits outside the batch loop); we sum over the batch.
  * UNet_Loss never reset ``self.loss`` between calls (losses.py:286);
    ours is stateless.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Elementary criteria
# ---------------------------------------------------------------------------

def _row_mean(per_elem: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes -> (B,)."""
    return per_elem.reshape(per_elem.shape[0], -1).mean(axis=1)


def _masked_mean(per_row: jnp.ndarray, valid: Optional[jnp.ndarray]
                 ) -> jnp.ndarray:
    """Mean of per-row values over VALID rows only. ``valid`` is a (B,) 0/1
    weight vector (pad-and-mask eval tails, data/loader.py); None means all
    rows count — the train path and full eval batches."""
    if valid is None:
        return jnp.mean(per_row)
    v = valid.astype(per_row.dtype)
    return jnp.sum(per_row * v) / jnp.maximum(jnp.sum(v), 1.0)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
            valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch.nn.L1Loss (mean reduction); pad rows excluded when ``valid``."""
    return _masked_mean(_row_mean(jnp.abs(pred - target)), valid)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
             valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return _masked_mean(_row_mean((pred - target) ** 2), valid)


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray,
                    valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch.nn.BCEWithLogitsLoss (mean), numerically stable form."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # log(1+exp(-|x|)) + max(x,0) - x*y
    per = (jnp.maximum(logits, 0.0) - logits * target
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return _masked_mean(_row_mean(per), valid)


# ---------------------------------------------------------------------------
# Reference's auxiliary losses, vectorized
# ---------------------------------------------------------------------------

def contrastive_loss(seq: jnp.ndarray, margin: float = 60000.0,
                     valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Cont_Loss (losses.py:128-156): over all ordered timestep pairs a>b,
    squared distance summed over (batch, embedding); adjacent pairs (a-b==1)
    pull together, the rest push apart to ``margin``; scaled by T(T-1)*1000.

    Vectorized: one (T, T) pairwise Gram computation instead of the
    reference's Python double loop. The reduction is a batch SUM, so zeroing
    pad rows (``valid``) removes their contribution exactly.
    """
    if valid is not None:
        seq = seq * valid.astype(seq.dtype)[:, None, None]
    B, T, E = seq.shape
    x = seq.astype(jnp.float32).transpose(1, 0, 2).reshape(T, B * E)
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)  # (T, T) batch-summed
    a = jnp.arange(T)
    lower = (a[:, None] - a[None, :]) > 0           # a > b
    adjacent = (a[:, None] - a[None, :]) == 1       # label 0 pairs
    per_pair = jnp.where(adjacent, jnp.maximum(0.0, margin - d2), d2)
    total = jnp.sum(jnp.where(lower, per_pair, 0.0))
    return total / (T * (T - 1) * 1000.0)


def merge_loss(processed_raw: jnp.ndarray, merged: jnp.ndarray,
               margin: float = 1.0,
               valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Merge_Loss (losses.py:190-219): all-pairs cosine similarity between the
    merged low+ultralow CLS (rows) and the raw CLS (columns); diagonal pairs
    contribute cos, off-diagonal contribute max(0, margin - cos); mean over B^2
    (over nvalid^2 pairs of valid rows when ``valid`` masks a padded tail).
    """
    a = merged.astype(jnp.float32)
    b = processed_raw.astype(jnp.float32)
    an = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-12)
    bn = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-12)
    cos = an @ bn.T                                   # (B, B)
    B = cos.shape[0]
    eye = jnp.eye(B, dtype=cos.dtype)
    per_pair = eye * cos + (1.0 - eye) * jnp.maximum(0.0, margin - cos)
    if valid is None:
        return jnp.sum(per_pair) / (B * B)
    v = valid.astype(cos.dtype)
    nv = jnp.maximum(jnp.sum(v), 1.0)
    return jnp.sum(per_pair * v[:, None] * v[None, :]) / (nv * nv)


def mask_loss(encoded: jnp.ndarray, mask_idx: jnp.ndarray,
              reconstructed: jnp.ndarray, margin: float = 15000.0,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mask_Loss (losses.py:223-279): for each masked timestep, contrast the
    reconstructed vector against every encoded timestep — neighbors within
    distance 1 pull, others push to ``margin``. Intended batch sum (the
    reference's total kept only the last batch item — not copied)."""
    B, T, E = encoded.shape
    K = mask_idx.shape[1]
    enc = encoded.astype(jnp.float32)
    rec = jnp.take_along_axis(reconstructed.astype(jnp.float32),
                              mask_idx[:, :, None], axis=1)  # (B, K, E)
    # d2[b, k, t] = ||rec[b,k] - enc[b,t]||^2
    d2 = jnp.sum((rec[:, :, None, :] - enc[:, None, :, :]) ** 2, axis=-1)
    t = jnp.arange(T)
    near = (jnp.abs(mask_idx[:, :, None] - t[None, None, :]) <= 1)
    per = jnp.where(near, d2, jnp.maximum(0.0, margin - d2))
    per = per / (T * (T - 1))
    per_item = jnp.sum(per, axis=2).mean(axis=1)      # mean over K, sum over T
    if valid is None:
        return jnp.sum(per_item) / (B * 100.0)
    v = valid.astype(per_item.dtype)
    return jnp.sum(per_item * v) / (jnp.maximum(jnp.sum(v), 1.0) * 100.0)


def _minmax01(x: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.min(x, axis=(-2, -1), keepdims=True)
    hi = jnp.max(x, axis=(-2, -1), keepdims=True)
    return (x - lo) / (hi - lo + 1e-12)


def unet_loss(fmri_in: jnp.ndarray, fmri_out: jnp.ndarray,
              struct_in: jnp.ndarray, struct_out: jnp.ndarray,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """UNet_Loss (losses.py:282-312): per-item MSE between the UNet output and
    the min-max-normalized input, both modalities, summed then /(10*B)
    (/(10*nvalid) over valid rows when ``valid`` masks a padded tail)."""
    B = fmri_in.shape[0]
    fo = fmri_out.reshape(fmri_in.shape).astype(jnp.float32)
    so = struct_out.reshape(struct_in.shape).astype(jnp.float32)
    f = jnp.mean((fo - _minmax01(fmri_in.astype(jnp.float32))) ** 2,
                 axis=(-2, -1))
    s = jnp.mean((so - _minmax01(struct_in.astype(jnp.float32))) ** 2,
                 axis=(-2, -1))
    per_item = (f + s).reshape(B, -1).sum(axis=1)
    if valid is None:
        return jnp.sum(per_item) / (10.0 * B)
    v = valid.astype(per_item.dtype)
    return jnp.sum(per_item * v) / (10.0 * jnp.maximum(jnp.sum(v), 1.0))


def intensity_voxel_mask(y: jnp.ndarray, low_quantile: float = 0.9) -> jnp.ndarray:
    """get_intense_voxels (losses.py:10-42) for 4-D fMRI volumes, vectorized:
    per (batch, TR) frame, zero anything at/below the corner background value,
    then threshold at an adaptive quantile of the remaining intensities.

    y: (B, H, W, D, T) -> bool mask of the same shape.
    """
    B, H, W, D, T = y.shape
    v = jnp.abs(jnp.where(y <= y[:, :1, :1, :1, :], 0.0, y))
    flat = v.transpose(0, 4, 1, 2, 3).reshape(B * T, H * W * D)
    n_pos = jnp.sum(flat > flat[:, 0:1], axis=1)
    q = 1.0 - (n_pos / flat.shape[1]) * (1.0 - low_quantile)
    # one quantile per row at that row's own level — vmap, NOT
    # jnp.quantile(flat, q, axis=1), which would materialize a
    # (B*T, B*T) cross product and take its diagonal
    thresh = jax.vmap(lambda row, qq: jnp.quantile(row, qq))(flat, q)
    mask = flat > thresh[:, None]
    return mask.reshape(B, T, H, W, D).transpose(0, 2, 3, 4, 1)


def intensity_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L1 restricted to the intense-voxel mask of the target
    (trainer.py:698-717 semantics). Pad rows (``valid``=0) are zeroed out of
    both the mask numerator and the voxel-count denominator — exact."""
    mask = intensity_voxel_mask(target).astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)
        mask = mask * v.reshape((v.shape[0],) + (1,) * (mask.ndim - 1))
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.abs(pred - target) * mask) / denom


def reconstruction_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return l1_loss(pred, target, valid)


# ---------------------------------------------------------------------------
# Registry (loss_writer.py:162-201)
# ---------------------------------------------------------------------------

@dataclass
class LossSpec:
    name: str
    factor: float = 1.0


def active_losses(task: str, fine_tune_task: str, *, use_merge_loss=False,
                  use_unet_loss=False, use_cont_loss=False, use_mask_loss=False,
                  intensity_factor=1.0, perceptual_factor=1.0,
                  reconstruction_factor=1.0) -> Dict[str, LossSpec]:
    """Which losses are active for a task, with their weights
    (loss_writer.py:181-201)."""
    t = task.lower()
    out: Dict[str, LossSpec] = {}
    if "reconstruction" in t:
        out["perceptual"] = LossSpec("perceptual", perceptual_factor)
        out["reconstruction"] = LossSpec("reconstruction", reconstruction_factor)
        out["intensity"] = LossSpec("intensity", intensity_factor)
        if "tran" in t and use_cont_loss:
            out["contrastive"] = LossSpec("contrastive")
        if "tran" in t and use_mask_loss:
            out["mask"] = LossSpec("mask")
    elif t in ("lowfreqbert", "2dbert", "funcstruct"):
        if use_merge_loss:
            out["merge"] = LossSpec("merge")
        if use_unet_loss:
            out["unet"] = LossSpec("unet")
        out[fine_tune_task] = LossSpec(fine_tune_task)
    elif t in ("test", "vit", "swinfusion"):
        out[fine_tune_task] = LossSpec(fine_tune_task)
    return out


def compute_losses(outputs: Dict[str, jnp.ndarray],
                   batch: Dict[str, jnp.ndarray],
                   specs: Dict[str, LossSpec],
                   extra_fns: Optional[Dict[str, Callable]] = None,
                   rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Evaluate every active loss from model outputs + batch, mirroring the
    trainer's per-loss ``compute_*`` adapters (trainer.py:693-754).

    Model output keys follow the reference contract (SURVEY §2.4):
    'binary_classification'/'regression' logits (B, 1); auxiliary
    'reconstructed_fmri_sequence', 'embedding_per_ROIs', 'processed_raw',
    'fMRI_input'/'fMRI_output'/'struct_input'/'struct_output', 'mask_list'.

    ``extra_fns`` carries stateful criteria that need weights of their own —
    today only 'perceptual' (nn/perceptual.py, reference losses.py:314-376),
    built by the Trainer when the registry activates it. ``rng`` feeds its
    random slice subsampling (the reference draws host-side random.sample
    per call, losses.py:351-355).

    ``batch['valid']`` (a (B,) 0/1 vector, emitted by the loader for eval
    splits) EXACTLY excludes pad-and-mask tail rows from every loss — the
    reference never pads (dataloaders.py:139 drops the tail for train and
    evaluates ragged tails natively on GPU; XLA needs static shapes, so we
    pad and mask instead).
    """
    target = batch.get("target")
    valid = batch.get("valid")
    vals: Dict[str, jnp.ndarray] = {}
    for name, spec in specs.items():
        if name == "binary_classification":
            v = bce_with_logits(outputs["binary_classification"].squeeze(-1),
                                target, valid)
        elif name == "regression":
            v = l1_loss(outputs["regression"].squeeze(-1).astype(jnp.float32),
                        target.astype(jnp.float32), valid)
        elif name == "merge":
            v = merge_loss(outputs["processed_raw"],
                           outputs["embedding_per_ROIs"], valid=valid)
        elif name == "unet":
            v = unet_loss(outputs["fMRI_input"], outputs["fMRI_output"],
                          outputs["struct_input"], outputs["struct_output"],
                          valid=valid)
        elif name == "contrastive":
            v = contrastive_loss(outputs["reconstructed_fmri_sequence"],
                                 valid=valid)
        elif name == "mask":
            v = mask_loss(outputs["encoded_inputs"], outputs["mask_list"],
                          outputs["reconstructed_fmri_sequence"], valid=valid)
        elif name == "reconstruction":
            v = reconstruction_loss(outputs["reconstructed_fmri_sequence"],
                                    batch["fmri_sequence"], valid)
        elif name == "intensity":
            v = intensity_loss(outputs["reconstructed_fmri_sequence"],
                               batch["fmri_sequence"], valid)
        elif name == "perceptual":
            if not extra_fns or "perceptual" not in extra_fns:
                raise KeyError(
                    "perceptual loss is active for this task but no "
                    "perceptual_fn was supplied — pass "
                    "extra_fns={'perceptual': PerceptualLoss(...)} "
                    "(the Trainer wires this automatically)")
            v = extra_fns["perceptual"](
                outputs["reconstructed_fmri_sequence"],
                batch["fmri_sequence"], rng, valid=valid)
        else:
            raise KeyError(f"unknown loss {name}")
        vals[name] = v * spec.factor
    vals["total"] = sum(vals.values()) if vals else jnp.asarray(0.0)
    return vals
