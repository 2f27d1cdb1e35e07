"""Perceptual (feature-space) loss for reconstruction tasks.

Re-implements the reference's Percept_Loss (reference losses.py:314-376):
random 2-D slices are drawn from the 6-D fMRI volume pair (subsampled by a
``memory_constraint`` fraction — 0.25 for autoencoder, 0.1 for transformer
reconstruction, losses.py:346-349), pushed through the first two VGG16
feature stages (relu1_2, relu2_2 — losses.py:90-120), and compared with MSE.

Weights: the reference depends on torchvision's pretrained VGG16 (losses.py:92)
and an external DenseNet3D UKB checkpoint that is absent from the repo
(losses.py:52 — dead path, SURVEY §2.3). Here the VGG16 stage is a flax module
whose parameters can be loaded from an ``.npz`` (``conv{i}_{j}/kernel|bias``
entries) via ``load_vgg16_npz``; with no weights file the loss still runs with
random features (useful only as a smoke path) and prints a warning once.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn

from multimodal_neuroimage_tpu.nn.common import LayerNorm
import jax
import jax.numpy as jnp
import numpy as np

_warned = False


class Vgg16Features(nn.Module):
    """First two VGG16 stages: conv1_1..conv1_2 (relu1_2) and
    conv2_1..conv2_2 after 2x2 maxpool (relu2_2) — losses.py:96-104."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (N, H, W, 3) -> (relu1_2, relu2_2)."""
        h = nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv1_1")(x))
        h = nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv1_2")(h))
        relu1_2 = h
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(nn.Conv(128, (3, 3), padding=1, name="conv2_1")(h))
        h = nn.relu(nn.Conv(128, (3, 3), padding=1, name="conv2_2")(h))
        return relu1_2, h


def load_vgg16_npz(path: str):
    """Load VGG16 stage weights from an npz with conv{i}_{j}/kernel|bias
    entries (HWIO kernels)."""
    data = np.load(path)
    params = {}
    for name in ("conv1_1", "conv1_2", "conv2_1", "conv2_2"):
        params[name] = {"kernel": jnp.asarray(data[f"{name}/kernel"]),
                        "bias": jnp.asarray(data[f"{name}/bias"])}
    return {"params": params}


class PerceptualLoss:
    """Callable loss: MSE between VGG features of prediction and target
    slices (losses.py:351-376)."""

    def __init__(self, task: str = "transformer_reconstruction",
                 weights_npz: Optional[str] = None, seed: int = 0):
        global _warned
        self.memory_constraint = (0.25 if task == "autoencoder_reconstruction"
                                  else 0.1)
        self.model = Vgg16Features()
        if weights_npz:
            self.variables = load_vgg16_npz(weights_npz)
        else:
            if not _warned:
                print("[perceptual] no VGG16 weights provided — using "
                      "random features (smoke mode)")
                _warned = True
            self.variables = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, 3)))
        self.seed = seed

    @staticmethod
    def _as_volume(x: jnp.ndarray) -> jnp.ndarray:
        """Normalize to the reference's (B, C, W, H, D, T) layout
        (losses.py:340-344). Also accepts the shapes this framework's models
        emit: (B, T, E) ROI timeseries (scored as one (T, E) image per item)
        and (B, H, W, D, T) channelless volumes."""
        if x.ndim == 3:
            B, T, E = x.shape
            return x.reshape(B, 1, T, E, 1, 1)
        if x.ndim == 5:
            return x[:, None]
        return x

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray,
                 rng: Optional[jax.Array] = None,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """pred/target: (B, C, W, H, D, T) volumes (reference layout,
        losses.py:340-344) or the 3-D/5-D shapes handled by ``_as_volume``.
        Random depth-slices are scored in feature space. ``valid`` (a (B,)
        0/1 vector) weights each drawn slice by its source batch row's
        validity, so pad-and-mask eval tail rows drop out exactly."""
        assert pred.shape == target.shape and pred.ndim in (3, 5, 6)
        pred = self._as_volume(pred)
        target = self._as_volume(target)
        B, C, W, H, D, T = pred.shape
        n_slices = B * T * D
        keep = max(int(n_slices * self.memory_constraint), 1)
        rng = rng if rng is not None else jax.random.PRNGKey(self.seed)
        idx = jax.random.permutation(rng, n_slices)[:keep]

        def slices(x):
            s = x.transpose(0, 5, 1, 4, 2, 3).reshape(n_slices, W, H)
            s = jnp.take(s, idx, axis=0)
            return jnp.repeat(s[..., None], 3, axis=-1)  # grey -> 3ch

        pf = self.model.apply(self.variables, slices(pred.astype(jnp.float32)))
        tf = self.model.apply(self.variables, slices(target.astype(jnp.float32)))
        if valid is None:
            loss = 0.0
            for a, b in zip(pf, tf):
                loss = loss + jnp.mean((a - b) ** 2)
            return loss
        # transpose above orders flat slices as (B, T, C, D): row = idx//(TCD)
        w = jnp.take(valid.astype(jnp.float32), idx // (T * C * D))
        denom = jnp.maximum(jnp.sum(w), 1.0)
        loss = 0.0
        for a, b in zip(pf, tf):
            per_slice = jnp.mean((a - b) ** 2,
                                 axis=tuple(range(1, a.ndim)))
            loss = loss + jnp.sum(per_slice * w) / denom
        return loss
