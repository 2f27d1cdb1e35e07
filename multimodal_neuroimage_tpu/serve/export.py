"""Ahead-of-time model export: checkpoint -> one self-contained artifact.

The reference has no deployment story at all — inference requires the full
Python stack (model classes, checkpoint loader, trainer plumbing; reference
main.py:569-590). TPU-natively the right artifact is **StableHLO via
``jax.export``**: the Predictor's jitted deterministic forward is staged out
with the trained parameters baked in as constants, serialized to a single
file, and reloaded for inference WITHOUT any model code, checkpoint format,
or config — just JAX and the bytes. The artifact is portable across
processes and (for the plain-XLA compute path) across backends; a sidecar
JSON records the input contract (batch keys / shapes / dtypes), the output
head, and the frozen g-mean validation threshold so a serving shim can
post-process scores identically to ``serve/predictor.py``.

Pallas note: on TPU the flagship forward may contain `tpu_custom_call`s
(ops/fusion_block.py etc.). Those export fine but tie the artifact to the
TPU platform; ``export_model(..., portable=True)`` pins the plain-jnp twin
kernels (ops/autoplan plans "std"/"loop") so the artifact stays
backend-agnostic at some speed cost.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_META_SUFFIX = ".json"


def _example_batch(pipe, records) -> Dict[str, np.ndarray]:
    """One host batch (names dropped) defining the input contract."""
    pipe.splits["__export__"] = list(records)
    for batch, _names in pipe.epoch("__export__", shuffle=False):
        return {k: np.asarray(v) for k, v in batch.items()}
    raise ValueError("empty cohort — nothing to infer the input batch from")


def export_model(predictor, dest: str, portable: bool = False) -> str:
    """Stage the Predictor's deterministic forward out to StableHLO.

    predictor: a ``serve.predictor.Predictor`` (params already loaded).
    dest: artifact path (e.g. ``model.stablehlo``); ``dest + ".json"`` gets
    the metadata sidecar. Returns ``dest``.
    """
    from jax import export as jexport

    if portable:
        # pin the plain-jnp twin paths for a backend-agnostic artifact
        # (the flax modules read these at trace time; restored below)
        import multimodal_neuroimage_tpu.nn.swinfusion as sf
        from multimodal_neuroimage_tpu.ops import attention as _att
        from multimodal_neuroimage_tpu.ops.attention import set_fused_attention
        prev_fused, prev_layout = _att._FORCED, sf._LAYOUT
        set_fused_attention(False)
        sf._LAYOUT = "std"

    example = _example_batch(predictor.pipe, predictor.records)
    model = predictor.model
    cdtype = (jnp.bfloat16 if predictor.cfg.compute_dtype == "bfloat16"
              else jnp.float32)
    head = predictor.head

    # Bake the params as constants PRE-CAST to the compute dtype: device_get
    # yields numpy leaves, which _cast_tree (jnp.ndarray-only) would skip —
    # the artifact must apply the same bf16 policy as the live Predictor
    # (and bf16 constants halve the artifact size).
    def _cast_leaf(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, cdtype)
        return jnp.asarray(a)

    params = jax.tree.map(_cast_leaf, jax.device_get(predictor.params))

    from multimodal_neuroimage_tpu.train.state import _cast_tree

    @jax.jit
    def forward(batch):
        b = _cast_tree(batch, cdtype)
        out = model.apply({"params": params}, b, deterministic=True)
        return out[head].astype(jnp.float32).reshape(-1)

    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, jnp.asarray(a).dtype),
        example)
    try:
        exported = jexport.export(
            forward,
            # Pallas kernels lower to custom calls; allow them explicitly —
            # the artifact is then valid only on this platform (docstring).
            disabled_checks=[
                jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
                jexport.DisabledSafetyCheck.custom_call("Sharding"),
            ])(specs)
    finally:
        if portable:
            set_fused_attention(prev_fused)
            sf._LAYOUT = prev_layout
    blob = exported.serialize()
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with open(dest, "wb") as f:
        f.write(blob)
    meta = {
        "head": head,
        "threshold": predictor.threshold,
        "platforms": list(exported.platforms),
        "checkpoint": predictor.checkpoint_path,
        "batch_contract": {k: {"shape": list(v.shape),
                               "dtype": str(np.asarray(v).dtype)}
                           for k, v in example.items()},
    }
    with open(dest + _META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=1)
    return dest


class ExportedModel:
    """Inference from the artifact alone — no model code, no checkpoint."""

    def __init__(self, path: str):
        from jax import export as jexport
        with open(path, "rb") as f:
            self._exported = jexport.deserialize(f.read())
        with open(path + _META_SUFFIX) as f:
            self.meta = json.load(f)
        self.head = self.meta["head"]
        self.threshold = float(self.meta["threshold"])
        self._contract = self.meta["batch_contract"]

    def __call__(self, batch: Dict) -> np.ndarray:
        """Raw head outputs (logits / regression values), shape (B,)."""
        b = {k: jnp.asarray(v, self._contract[k]["dtype"])
             for k, v in batch.items() if k in self._contract}
        missing = set(self._contract) - set(b)
        if missing:
            raise KeyError(f"batch missing exported inputs: {sorted(missing)}")
        return np.asarray(self._exported.call(b))

    def predict(self, batch: Dict) -> Dict[str, np.ndarray]:
        """Post-processed like Predictor.predict: sigmoid probabilities +
        frozen-threshold hard labels for classification heads."""
        raw = self(batch)
        if self.head == "binary_classification":
            prob = 1.0 / (1.0 + np.exp(-raw))
            return {"score": prob,
                    "label": (prob > self.threshold).astype(np.float32)}
        return {"score": raw}


def load_exported(path: str) -> ExportedModel:
    return ExportedModel(path)
