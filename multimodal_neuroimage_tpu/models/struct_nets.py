"""Structural-matrix models (phase 3): SwinV2 classifier [+ VAE / UNet fronts].

Batch-dict wrappers around the SwinV2 encoder (nn/swin2d.py) matching the
reference's step-3 dispatch (reference trainer.py:228-239) and input routing
(trainer.py:489-505: 'dti' / 'smri' / 'struct' keys by dataset_name).

  * SwinClassifier      — reference SwinTransformerV2 (model.py:970-1129)
  * SwinClassifierVAE   — SwinTransformerV2_VAE (model.py:557-728): MLP VAE
    84^2 -> 64^2 -> 32^2 -> 16^2 with reparameterization; the reconstruction
    feeds the Swin encoder
  * SwinClassifierUNet  — SwinTransformerV2_UNet (model.py:802-967): 4-down /
    4-up UNet denoiser before the Swin encoder
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_neuroimage_tpu.nn.swin2d import SwinTransformerV2, size_preset
from multimodal_neuroimage_tpu.nn.unet import UNet2D


def struct_input(batch: Dict, dataset_name: str) -> jnp.ndarray:
    """Input routing by dataset (trainer.py:489-505)."""
    key = {"DTI": "dti", "sMRI": "smri", "DTI+sMRI": "struct",
           "struct": "struct"}.get(dataset_name, "struct")
    if key in batch:
        return batch[key]
    for k in ("struct", "smri", "dti"):
        if k in batch:
            return batch[k]
    raise KeyError(f"no structural input in batch for {dataset_name}")


def build_swin(cfg_like, num_classes: int = 1,
               name: str = "swin") -> SwinTransformerV2:
    depths, heads = size_preset(cfg_like.size_of_model)
    return SwinTransformerV2(
        img_size=(84, 84), patch_size=cfg_like.patch_size,
        embed_dim=cfg_like.swin_embed_dim, depths=depths, num_heads=heads,
        window_size=cfg_like.window_size, mlp_ratio=cfg_like.mlp_ratio,
        drop_rate=cfg_like.drop_rate, attn_drop_rate=cfg_like.attn_drop_rate,
        drop_path_rate=cfg_like.drop_path_rate, num_classes=num_classes,
        name=name)


class SwinClassifier(nn.Module):
    """84x84 matrix -> SwinV2 -> logit (model.py:970-1129)."""

    size_of_model: str = "large"
    patch_size: int = 7
    swin_embed_dim: int = 12
    window_size: int = 6
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fine_tune_task: str = "binary_classification"
    dataset_name: str = "sMRI"

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        x = struct_input(batch, self.dataset_name).astype(jnp.float32)
        logits = build_swin(self)(x, deterministic)
        return {self.fine_tune_task: logits}


class MlpVae(nn.Module):
    """MLP VAE over flattened 84x84 (model.py:602-718): encoder
    84^2 -> 64^2 -> 32^2 -> (mu, logvar) 16^2, mirror decoder, sigmoid out."""

    latent: int = 16 * 16

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B = x.shape[0]
        flat = x.reshape(B, -1)
        h = nn.relu(nn.Dense(64 * 64, name="enc1")(flat))
        h = nn.relu(nn.Dense(32 * 32, name="enc2")(h))
        mu = nn.Dense(self.latent, name="mu")(h)
        logvar = nn.Dense(self.latent, name="logvar")(h)
        if deterministic:
            z = mu
        else:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape,
                                    mu.dtype)
            z = mu + jnp.exp(0.5 * logvar) * eps
        h = nn.relu(nn.Dense(32 * 32, name="dec1")(z))
        h = nn.relu(nn.Dense(64 * 64, name="dec2")(h))
        recon = nn.sigmoid(nn.Dense(84 * 84, name="dec3")(h))
        return recon.reshape(x.shape), mu, logvar


class SwinClassifierVAE(nn.Module):
    """VAE reconstruction -> SwinV2 (model.py:557-728)."""

    size_of_model: str = "large"
    patch_size: int = 7
    swin_embed_dim: int = 12
    window_size: int = 6
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fine_tune_task: str = "binary_classification"
    dataset_name: str = "sMRI"

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        x = struct_input(batch, self.dataset_name).astype(jnp.float32)
        recon, mu, logvar = MlpVae(name="vae")(x, deterministic)
        logits = build_swin(self)(recon, deterministic)
        return {self.fine_tune_task: logits, "vae_recon": recon,
                "vae_mu": mu, "vae_logvar": logvar}


class SwinClassifierUNet(nn.Module):
    """UNet denoiser -> SwinV2 (model.py:802-967)."""

    size_of_model: str = "large"
    patch_size: int = 7
    swin_embed_dim: int = 12
    window_size: int = 6
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fine_tune_task: str = "binary_classification"
    dataset_name: str = "sMRI"

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        x = struct_input(batch, self.dataset_name).astype(jnp.float32)
        denoised = UNet2D(name="unet")(x[..., None], deterministic)[..., 0]
        logits = build_swin(self)(denoised, deterministic)
        return {self.fine_tune_task: logits, "struct_input": x,
                "struct_output": denoised}
