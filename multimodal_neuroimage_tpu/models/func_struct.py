"""Func+Struct multimodal combiners (phase 5).

Re-implements the reference's six combiners (reference model.py):
  * Func_Struct_Cross          (1559-2037) -> FuncStructCross
  * Func_Struct_UNet_Cross_PRS (2040-2610) -> FuncStructUNetCrossPRS
  * Func_Struct_UNet_Cross     (2612-3186) -> FuncStructUNetCross
  * Func_Struct_Transfer       (3187-3367) -> FuncStructTransfer
  * Func_Struct_Add            (3370-3552) -> FuncStructAdd
  * Func_Struct_UNet_Add       (3554-3761) -> FuncStructUNetAdd

Shared mechanics: dual temporal BERTs over the low/ultralow bands, CLS fusion
(concat+projection or hadamard), the fused 84-vector diagonal-embedded into an
84x84 matrix (model.py:1977-1989) optionally summed with the ROI functional-
connectivity matrix. The reference computed that FC with numpy on the CPU
inside forward (``compute_fc``, model.py:1941-1946 — a D2H->H2D round trip per
batch); here it is an on-device batched corrcoef fused into the same XLA
program (SURVEY §7.2 step 6).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodal_neuroimage_tpu.models.fmri_nets import TimeProj
from multimodal_neuroimage_tpu.models.swinfusion_net import SwinFusionBackbone
from multimodal_neuroimage_tpu.nn.bert import TemporalBert
from multimodal_neuroimage_tpu.nn.swin2d import SwinTransformerV2, size_preset
from multimodal_neuroimage_tpu.nn.unet import UNet2D


def batched_fc_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample ROI functional connectivity: corrcoef over time, negative
    entries and the diagonal zeroed (compute_fc, model.py:1941-1946).

    x: (B, T, R) -> (B, R, R), computed on device.
    """
    x = x.astype(jnp.float32)
    xc = x - x.mean(axis=1, keepdims=True)
    cov = jnp.einsum("btr,bts->brs", xc, xc)
    std = jnp.sqrt(jnp.einsum("btr,btr->br", xc, xc))
    corr = cov / (std[:, :, None] * std[:, None, :] + 1e-12)
    corr = corr * (corr > 0)
    eye = jnp.eye(corr.shape[-1], dtype=corr.dtype)
    return corr * (1.0 - eye)


class FmriDiagEmbed(nn.Module):
    """Dual-band BERT encoding -> fused CLS -> diagonal 84x84 embedding
    [+ FC matrix] (model.py:1948-1989)."""

    intermediate_vec: int = 84
    transformer_hidden_layers: int = 16
    num_heads_2DBert: int = 12
    sequence_length: int = 368
    transformer_dropout_rate: float = 0.1
    bert_intermediate_size: int = 3072
    concat_method: str = "concat"
    feature_map_size: str = "same"
    feature_map_gen: str = "no"
    use_FC: bool = False
    use_merge_loss: bool = False
    # HF BertConfig attention_probs_dropout_prob: the reference never wires
    # it (model.py:62 sets hidden_dropout_prob only), leaving the HF default
    # 0.1 — same default here, but exposed so it can be zeroed
    bert_attn_dropout: float = 0.1

    def _bert(self, name: str, max_pos: int, dropout: float) -> TemporalBert:
        return TemporalBert(self.intermediate_vec,
                            self.transformer_hidden_layers,
                            self.num_heads_2DBert, max_pos,
                            self.bert_intermediate_size,
                            hidden_dropout=dropout,
                            attn_dropout=self.bert_attn_dropout, name=name)

    @nn.compact
    def __call__(self, x_raw, x_l, x_u, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        aux: Dict[str, jnp.ndarray] = {}
        dr = self.transformer_dropout_rate
        if self.use_merge_loss and x_raw is not None:
            raw = self._bert("transformer_raw", self.sequence_length + 1, dr)(
                x_raw, deterministic)
            aux["processed_raw"] = raw["cls"]
        if self.feature_map_size == "different":
            if self.feature_map_gen == "convolution_ul":
                x_u = TimeProj(128, name="proj_u")(x_u)
            low = self._bert("transformer_low", self.sequence_length + 1, dr)(
                x_l, deterministic)
            ul = self._bert("transformer_ultralow", 128 + 1, 0.1)(
                x_u, deterministic)
        else:
            low = self._bert("transformer_low", self.sequence_length + 1, dr)(
                x_l, deterministic)
            ul = self._bert("transformer_ultralow",
                            self.sequence_length + 1, dr)(x_u, deterministic)

        if self.concat_method == "concat":
            cls = jnp.concatenate([low["cls"], ul["cls"]], axis=1)
            cls = nn.Dense(self.intermediate_vec, name="proj_layer")(cls)
        else:
            cls = low["cls"] * ul["cls"]
        aux["embedding_per_ROIs"] = cls

        embed = jnp.zeros((cls.shape[0], cls.shape[1], cls.shape[1]),
                          cls.dtype)
        embed = embed + cls[:, :, None] * jnp.eye(cls.shape[1], dtype=cls.dtype)
        if self.use_FC and x_raw is not None:
            embed = embed + batched_fc_matrix(x_raw).astype(cls.dtype)
        return embed, aux


class _FuncStructBase(nn.Module):
    """Shared config surface for all six combiners."""

    intermediate_vec: int = 84
    transformer_hidden_layers: int = 16
    num_heads_2DBert: int = 12
    sequence_length: int = 368
    transformer_dropout_rate: float = 0.1
    bert_intermediate_size: int = 3072
    concat_method: str = "concat"
    feature_map_size: str = "same"
    feature_map_gen: str = "no"
    use_FC: bool = False
    use_merge_loss: bool = False
    use_unet_loss: bool = False
    use_unet_function: bool = False
    use_unet_struct: bool = False
    prs_unsqueeze: str = "single_convolution"
    prs_concat_method: str = "add"
    fusion_embed_dim: int = 12
    fusion_ex_depths: Tuple[int, ...] = (6, 6)
    fusion_depths: Tuple[int, ...] = (2, 2, 2)
    fusion_re_depths: Tuple[int, ...] = (6, 6)
    fusion_ex_heads: Tuple[int, ...] = (6, 6)
    fusion_heads: Tuple[int, ...] = (6, 6, 6)
    fusion_re_heads: Tuple[int, ...] = (6, 6)
    fusion_drop: float = 0.1            # Func_Struct_Cross defaults (model.py:1591)
    fusion_drop_path: float = 0.1       # reference hardcodes 0.1 (model.py:1591);
                                        # a field here so tests/experiments can
                                        # zero it (wired from cfg.fusion_drop_path_rate)
    bert_attn_dropout: float = 0.1      # see FmriDiagEmbed.bert_attn_dropout
    window_size: int = 6
    mlp_ratio: float = 4.0
    size_of_model: str = "large"
    swin_embed_dim: int = 12
    patch_size: int = 7
    fine_tune_task: str = "binary_classification"

    @classmethod
    def from_config(cls, cfg):
        return cls(
            intermediate_vec=cfg.intermediate_vec,
            transformer_hidden_layers=cfg.transformer_hidden_layers,
            num_heads_2DBert=cfg.num_heads_2DBert,
            sequence_length=cfg.sequence_length,
            transformer_dropout_rate=cfg.transformer_dropout_rate,
            bert_intermediate_size=cfg.bert_intermediate_size,
            concat_method=cfg.concat_method,
            feature_map_size=cfg.feature_map_size,
            feature_map_gen=cfg.feature_map_gen,
            use_FC=cfg.use_FC, use_merge_loss=cfg.use_merge_loss,
            use_unet_loss=cfg.use_unet_loss,
            use_unet_function=cfg.use_unet_function,
            use_unet_struct=cfg.use_unet_struct,
            prs_unsqueeze=cfg.prs_unsqueeze,
            prs_concat_method=cfg.prs_concat_method,
            fusion_embed_dim=cfg.fusion_embed_dim,
            fusion_ex_depths=tuple(cfg.fusion_ex_depths),
            fusion_depths=tuple(cfg.fusion_depths),
            fusion_re_depths=tuple(cfg.fusion_re_depths),
            fusion_ex_heads=tuple(cfg.fusion_ex_heads),
            fusion_heads=tuple(cfg.fusion_heads),
            fusion_re_heads=tuple(cfg.fusion_re_heads),
            fusion_drop=cfg.fusion_drop_rate,
            fusion_drop_path=cfg.fusion_drop_path_rate,
            bert_attn_dropout=cfg.bert_attn_dropout,
            window_size=cfg.window_size, mlp_ratio=cfg.mlp_ratio,
            size_of_model=cfg.size_of_model,
            swin_embed_dim=cfg.swin_embed_dim, patch_size=cfg.patch_size,
            fine_tune_task=cfg.fine_tune_task)

    def _embedder(self) -> FmriDiagEmbed:
        return FmriDiagEmbed(
            self.intermediate_vec, self.transformer_hidden_layers,
            self.num_heads_2DBert, self.sequence_length,
            self.transformer_dropout_rate, self.bert_intermediate_size,
            self.concat_method, self.feature_map_size, self.feature_map_gen,
            self.use_FC, self.use_merge_loss,
            bert_attn_dropout=self.bert_attn_dropout, name="fmri_embed")

    def _fusion(self) -> SwinFusionBackbone:
        # the fused image side equals the ROI count (84; smaller for dry runs)
        return SwinFusionBackbone(
            self.fusion_embed_dim, self.fusion_ex_depths, self.fusion_depths,
            self.fusion_re_depths, self.fusion_ex_heads, self.fusion_heads,
            self.fusion_re_heads, img_size=self.intermediate_vec,
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio, drop_rate=self.fusion_drop,
            attn_drop_rate=self.fusion_drop,
            drop_path_rate=self.fusion_drop_path,
            name="fusion")

    def _swin(self) -> SwinTransformerV2:
        depths, heads = size_preset(self.size_of_model)
        iv = self.intermediate_vec
        return SwinTransformerV2(
            img_size=(iv, iv), patch_size=self.patch_size,
            embed_dim=self.swin_embed_dim, depths=depths, num_heads=heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            drop_path_rate=self.fusion_drop_path, num_classes=1, name="swin")


class FuncStructCross(_FuncStructBase):
    """Dual BERTs -> diag embed -> SwinFusion with struct -> SwinV2
    (model.py:1948-2020)."""

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        embed, aux = self._embedder()(
            batch.get("fmri_raw_sequence"), batch["fmri_lowfreq_sequence"],
            batch["fmri_ultralowfreq_sequence"], deterministic)
        fused = self._fusion()(embed, batch["struct"].astype(jnp.float32),
                               deterministic)
        logits = self._swin()(fused, deterministic)
        return {self.fine_tune_task: logits, **aux}


class FuncStructUNetCross(_FuncStructBase):
    """+ UNet denoiser on the fMRI embedding and/or struct before fusion
    (model.py:2612-3186, forward 3100-3165)."""

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        return self._forward_unet_cross(batch, deterministic, None)

    def _forward_unet_cross(self, batch: Dict, deterministic: bool,
                            prs_latent) -> Dict:
        embed, aux = self._embedder()(
            batch.get("fmri_raw_sequence"), batch["fmri_lowfreq_sequence"],
            batch["fmri_ultralowfreq_sequence"], deterministic)
        struct = batch["struct"].astype(jnp.float32)
        a, b = embed, struct
        # the reference shares ONE UNet between modalities (same self.inc/
        # down*/up* applied to x and y, model.py:3108-3131)
        unet = UNet2D(name="unet")
        if self.use_unet_function:
            a = unet(embed[..., None], deterministic)[..., 0]
        if self.use_unet_struct:
            b = unet(struct[..., None], deterministic,
                     inject=prs_latent,
                     concat_method=self.prs_concat_method)[..., 0]
        fused = self._fusion()(a, b, deterministic)
        logits = self._swin()(fused, deterministic)
        out = {self.fine_tune_task: logits, **aux}
        if self.use_unet_loss:
            out.update({"fMRI_input": embed, "fMRI_output": a,
                        "struct_input": struct, "struct_output": b})
        return out


class FuncStructUNetCrossPRS(FuncStructUNetCross):
    """+ polygenic-score latent injected at the UNet bottleneck
    (model.py:2040-2610, PRS path 2459-2475, injection 2525-2529)."""

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        prs = batch["prs"].astype(jnp.float32)          # (B, 3)
        diag = prs[:, :, None] * jnp.eye(prs.shape[1])  # (B, 3, 3)
        diag = diag[..., None]                          # NHWC (B, 3, 3, 1)
        # ConvTranspose2d(1,1,3): 3x3 -> 5x5 (model.py:2096, 2471)
        up = nn.ConvTranspose(1, (3, 3), padding="VALID", name="conv_prs")(diag)
        if self.prs_unsqueeze == "single_convolution":
            latent = nn.Conv(1024, (3, 3), padding="SAME",
                             name="up_prs")(up)          # (B, 5, 5, 1024)
        elif self.prs_unsqueeze == "multiple_convolution":
            h = up
            for i, ch in enumerate((64, 128, 256, 512, 1024)):
                h = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"up_prs{i + 1}")(h)
            latent = h
        else:  # repeat
            latent = jnp.repeat(up, 1024, axis=-1)
        return self._forward_unet_cross(batch, deterministic, latent)


class FuncStructTransfer(_FuncStructBase):
    """Diag embedding pushed through a (struct-pretrained) SwinV2
    (model.py:3187-3367, forward 3281-3326)."""

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        embed, aux = self._embedder()(
            batch.get("fmri_raw_sequence"), batch["fmri_lowfreq_sequence"],
            batch["fmri_ultralowfreq_sequence"], deterministic)
        logits = self._swin()(embed, deterministic)
        return {self.fine_tune_task: logits, **aux}


class FuncStructAdd(_FuncStructBase):
    """struct + diag embedding elementwise -> SwinV2
    (model.py:3370-3552, forward 3464-3511)."""

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        embed, aux = self._embedder()(
            batch.get("fmri_raw_sequence"), batch["fmri_lowfreq_sequence"],
            batch["fmri_ultralowfreq_sequence"], deterministic)
        combined = batch["struct"].astype(jnp.float32) + embed
        logits = self._swin()(combined, deterministic)
        return {self.fine_tune_task: logits, **aux}


class FuncStructUNetAdd(_FuncStructBase):
    """UNet on struct first, then add (model.py:3554-3761, forward 3663-3720)."""

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        embed, aux = self._embedder()(
            batch.get("fmri_raw_sequence"), batch["fmri_lowfreq_sequence"],
            batch["fmri_ultralowfreq_sequence"], deterministic)
        struct = batch["struct"].astype(jnp.float32)
        denoised = UNet2D(name="unet")(struct[..., None],
                                       deterministic)[..., 0]
        logits = self._swin()(denoised + embed, deterministic)
        out = {self.fine_tune_task: logits, **aux}
        if self.use_unet_loss:
            out.update({"fMRI_input": embed, "fMRI_output": embed,
                        "struct_input": struct, "struct_output": denoised})
        return out
