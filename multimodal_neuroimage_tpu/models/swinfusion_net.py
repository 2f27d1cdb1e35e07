"""SwinFusion: bidirectional struct-struct fusion network (phase 6).

Re-implements the reference SwinFusion (reference model.py:1131-1555),
SwinIR-derived:

  conv stem (1 -> embed/2 -> embed, LeakyReLU 0.2; the reference applies the
  *A* stem to both modalities — model.py:1406-1407 — so the stem is shared) ->
  per-modality RSTB deep-extraction branches (Ex, model.py:1238-1280) ->
  CRSTB cross-fusion (1282-1303) -> concat + 3x3 conv collapse to embed
  (1461-1462) -> RSTB reconstruction + 3-conv collapse to 1 channel
  (1305-1368, 1476-1482) -> SwinV2 classifier head (1185-1191, 1537).

The mean-shift in/out (model.py:1496-1534) is a no-op for 1-channel inputs
(self.mean is zeros, model.py:1177) and is therefore omitted. check_image_size
reflect-padding (1389-1394) is unnecessary for the fixed 84x84 input
(84 % window 6 == 0).

Tokens stay at pixel resolution (84x84 = 7056 per modality) exactly as in the
reference, where PatchEmbed_fusion is a flatten and x_size == (84, 84).

The reference instantiates ONE ``patch_embed`` (flatten + LayerNorm,
swinfusion_module.py:941-974) and reuses it at every stage entry — Ex_A,
Ex_B, both Fusion streams, and Re (model.py:1400-1471). The LayerNorm is
therefore SHARED across all five sites; we reproduce that with a single
``patch_norm`` module (golden-parity-checked in tests/test_swin_golden.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn

from multimodal_neuroimage_tpu.nn.common import LayerNorm  # noqa: F401 (SwinFusionNet head below)
import jax.numpy as jnp
import numpy as np

from multimodal_neuroimage_tpu.nn.common import TorchConv
from multimodal_neuroimage_tpu.nn.swinfusion import CRSTB, RSTB
from multimodal_neuroimage_tpu.nn.swin2d import SwinTransformerV2


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


class SwinFusionBackbone(nn.Module):
    """Everything up to the fused 1-channel 84x84 map (reusable inside the
    Func_Struct_* combiners, model.py:2010-2013)."""

    embed_dim: int = 12
    ex_depths: Tuple[int, ...] = (6, 6)
    fusion_depths: Tuple[int, ...] = (2, 2, 2)
    re_depths: Tuple[int, ...] = (6, 6)
    ex_heads: Tuple[int, ...] = (6, 6)
    fusion_heads: Tuple[int, ...] = (6, 6, 6)
    re_heads: Tuple[int, ...] = (6, 6)
    img_size: int = 84
    window_size: int = 6
    mlp_ratio: float = 4.0
    drop_rate: float = 0.8           # SwinFusion defaults (model.py:1161)
    attn_drop_rate: float = 0.8
    drop_path_rate: float = 0.1

    def _dpr(self, depths):
        return list(np.linspace(0, self.drop_path_rate, sum(depths)))

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """a, b: (B, 84, 84) -> fused (B, 84, 84)."""
        import multimodal_neuroimage_tpu.nn.swinfusion as sfm
        from multimodal_neuroimage_tpu.nn.swinfusion import (GroupLaneNorm,
                                                             _bp_enter,
                                                             _bp_exit)
        from multimodal_neuroimage_tpu.ops.attention import (
            fused_attention_active)
        E = self.embed_dim
        res = (self.img_size, self.img_size)
        L = res[0] * res[1]
        pos_drop = nn.Dropout(self.drop_rate)
        # Whole-pipeline group-major residency (ROADMAP round-5): under the
        # BP kernel layouts every inter-stage tensor — the shared patch_norm
        # LNs, pos_drop, the RSTB/CRSTB residual adds — stays in the
        # kernels' (ngroups, L, G*C) f32 layout. A token-major (B, L, 12)
        # f32 buffer pads 10.7x under T(8,128); the 96-lane group-major
        # stream pads 1.33x. Enter once after each conv (convs need the
        # spatial (B, 84, 84, E) form), exit once before the next conv.
        grouped = (sfm._LAYOUT in ("bp", "bpr") and fused_attention_active())

        def enter(t):
            return _bp_enter(t) if grouped else t

        def exit_(t, B):
            return _bp_exit(t, B) if grouped else t

        # shared conv stem (reference uses the A stem for both, model.py:1406)
        stem1 = TorchConv(E // 2, (3, 3), name="conv_first1_A")
        stem2 = TorchConv(E, (3, 3), name="conv_first2_A")
        # the reference's single patch_embed LayerNorm, shared by every
        # stage entry (see module docstring); group-major capable
        patch_norm = GroupLaneNorm(E, name="patch_norm")

        def extract(x, branch: str):
            h = _lrelu(stem2(_lrelu(stem1(x[..., None]))))    # (B, 84, 84, E)
            t = enter(h.reshape(h.shape[0], L, E))
            t = patch_norm(t, grouped)
            t = pos_drop(t, deterministic=deterministic)
            dpr = self._dpr(self.ex_depths)
            for i, (depth, heads) in enumerate(zip(self.ex_depths,
                                                   self.ex_heads)):
                t = RSTB(E, res, depth, heads, self.window_size,
                         self.mlp_ratio, drop=self.drop_rate,
                         attn_drop=self.attn_drop_rate,
                         drop_path=dpr[sum(self.ex_depths[:i]):
                                       sum(self.ex_depths[:i + 1])],
                         io_groups=grouped,
                         name=f"Ex_{branch}_{i}")(t, deterministic)
            return GroupLaneNorm(E, name=f"norm_Ex_{branch}")(t, grouped)

        B = a.shape[0]
        x = extract(a.astype(jnp.float32), "A")
        y = extract(b.astype(jnp.float32), "B")

        # cross-fusion (model.py:1441-1462; re-enters via the shared
        # patch_embed -> norm + pos_drop)
        x = pos_drop(patch_norm(x, grouped), deterministic=deterministic)
        y = pos_drop(patch_norm(y, grouped), deterministic=deterministic)
        dpr = self._dpr(self.fusion_depths)
        for i, (depth, heads) in enumerate(zip(self.fusion_depths,
                                               self.fusion_heads)):
            x, y = CRSTB(E, res, depth, heads, self.window_size,
                         self.mlp_ratio, drop=self.drop_rate,
                         attn_drop=self.attn_drop_rate,
                         drop_path=dpr[sum(self.fusion_depths[:i]):
                                       sum(self.fusion_depths[:i + 1])],
                         io_groups=grouped,
                         name=f"Fusion_{i}")(x, y, deterministic)
        x = exit_(GroupLaneNorm(E, name="norm_Fusion_A")(x, grouped), B)
        y = exit_(GroupLaneNorm(E, name="norm_Fusion_B")(y, grouped), B)
        h = jnp.concatenate([x.reshape(-1, *res, E), y.reshape(-1, *res, E)],
                            axis=-1)
        h = _lrelu(TorchConv(E, (3, 3),
                             name="conv_after_body_Fusion")(h))

        # reconstruction (model.py:1464-1482; shared patch norm again)
        t = enter(h.reshape(h.shape[0], L, E))
        t = pos_drop(patch_norm(t, grouped), deterministic=deterministic)
        dpr = self._dpr(self.re_depths)
        for i, (depth, heads) in enumerate(zip(self.re_depths, self.re_heads)):
            t = RSTB(E, res, depth, heads, self.window_size, self.mlp_ratio,
                     drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                     drop_path=dpr[sum(self.re_depths[:i]):
                                   sum(self.re_depths[:i + 1])],
                     io_groups=grouped,
                     name=f"Re_{i}")(t, deterministic)
        t = exit_(GroupLaneNorm(E, name="norm_Re")(t, grouped), B)
        h = t.reshape(-1, *res, E)
        h = _lrelu(TorchConv(E // 2, (3, 3), name="conv_last1")(h))
        h = _lrelu(TorchConv(E // 4, (3, 3), name="conv_last2")(h))
        h = TorchConv(1, (3, 3), name="conv_last3")(h)
        return h[..., 0]                                     # (B, 84, 84)


class SwinFusionNet(nn.Module):
    """Phase-6 model: fuse (sMRI, DTI) -> SwinV2 classifier (model.py:1537)."""

    embed_dim: int = 12
    ex_depths: Tuple[int, ...] = (6, 6)
    fusion_depths: Tuple[int, ...] = (2, 2, 2)
    re_depths: Tuple[int, ...] = (6, 6)
    ex_heads: Tuple[int, ...] = (6, 6)
    fusion_heads: Tuple[int, ...] = (6, 6, 6)
    re_heads: Tuple[int, ...] = (6, 6)
    window_size: int = 6
    mlp_ratio: float = 4.0
    drop_rate: float = 0.8
    attn_drop_rate: float = 0.8
    drop_path_rate: float = 0.1
    fine_tune_task: str = "binary_classification"

    @classmethod
    def from_config(cls, cfg) -> "SwinFusionNet":
        return cls(embed_dim=cfg.fusion_embed_dim,
                   ex_depths=tuple(cfg.fusion_ex_depths),
                   fusion_depths=tuple(cfg.fusion_depths),
                   re_depths=tuple(cfg.fusion_re_depths),
                   ex_heads=tuple(cfg.fusion_ex_heads),
                   fusion_heads=tuple(cfg.fusion_heads),
                   re_heads=tuple(cfg.fusion_re_heads),
                   window_size=cfg.window_size, mlp_ratio=cfg.mlp_ratio,
                   drop_rate=cfg.fusion_drop_rate,
                   attn_drop_rate=cfg.fusion_attn_drop_rate,
                   drop_path_rate=cfg.fusion_drop_path_rate,
                   fine_tune_task=cfg.fine_tune_task)

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        fused = SwinFusionBackbone(
            self.embed_dim, self.ex_depths, self.fusion_depths, self.re_depths,
            self.ex_heads, self.fusion_heads, self.re_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            drop_rate=self.drop_rate, attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate, name="fusion")(
            batch["smri"], batch["dti"], deterministic)
        # final classifier uses the reference's fixed SwinV2 config
        # (model.py:1185-1191): embed 12, depths [2,2,6], heads [3,6,12]
        logits = SwinTransformerV2(
            img_size=(84, 84), patch_size=7, embed_dim=12,
            depths=(2, 2, 6), num_heads=(3, 6, 12), window_size=6,
            drop_path_rate=0.1, num_classes=1, name="swin")(
            fused, deterministic)
        return {self.fine_tune_task: logits, "fused_image": fused}
