"""Import reference ``.pth`` checkpoints (torch state_dicts) into this
framework's flax param trees.

The reference saves raw ``model.state_dict()`` checkpoints (reference
trainer.py save path / utils.py weight chaining). This module maps those
trees onto our modules so a reference user can migrate trained weights:

  * HF BERT temporal encoder        -> utils/hf_import.bert_params_from_hf
    (re-exported here), reference model.py:159.
  * SwinV2 encoder/classifier       -> ``swin_encoder_tree`` for
    nn/swin2d.SwinTransformerV2 (reference model.py:557-728 state names
    ``patch_embed.* / layers.{i}.blocks.{j}.* / norm / head``).
  * MLP VAE                         -> ``vae_tree`` for
    models/struct_nets.MlpVae (reference model.py:602-718 ``fc1..fc6``).
  * SwinFusion self/cross blocks    -> ``fusion_block_tree`` /
    ``cross_fusion_block_tree`` for nn/swinfusion.{FusionBlock,
    CrossFusionBlock} (reference swinfusion_module.py:265-558).

All mappers take a ``{name: tensor-or-ndarray}`` mapping (a torch
state_dict works directly; tensors are detached) plus a ``prefix`` for
selecting a submodule inside a larger checkpoint, and return plain
numpy trees ready for ``jax.tree_util.tree_map(jnp.asarray, tree)``.

The golden parity tests (tests/test_swin_golden.py, tests/test_bert_parity.py)
drive these mappers against the reference modules running under torch, so
the mapping itself is activation-verified.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import numpy as np

from multimodal_neuroimage_tpu.utils.hf_import import (  # noqa: F401
    bert_params_from_hf)


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def _dense(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _ln(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _stack(trees: Sequence[Dict]) -> Dict:
    """Stack per-depth param trees along a leading axis (nn.scan layout)."""
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


# ---------------------------------------------------------------------------
# SwinV2 (cosine attention, cpb-MLP, res-post-norm) — nn/swin2d.py
# ---------------------------------------------------------------------------


def swin_attention_tree(sd: Mapping[str, Any], prefix: str = "") -> Dict:
    """``WindowAttention`` (swin_v2_module.py:65-196) -> WindowAttentionV2."""
    g = lambda n: _t(sd[prefix + n])
    return {
        "qkv_kernel": g("qkv.weight").T,
        "q_bias": g("q_bias"),
        "v_bias": g("v_bias"),
        "logit_scale": g("logit_scale"),
        "cpb_fc1": {"kernel": g("cpb_mlp.0.weight").T,
                    "bias": g("cpb_mlp.0.bias")},
        "cpb_fc2": {"kernel": g("cpb_mlp.2.weight").T},
        "proj": {"kernel": g("proj.weight").T, "bias": g("proj.bias")},
    }


def swin_block_tree(sd: Mapping[str, Any], prefix: str = "") -> Dict:
    """``SwinTransformerBlock`` (swin_v2_module.py:198-323) -> SwinBlockV2."""
    return {
        "attn": swin_attention_tree(sd, prefix + "attn."),
        "norm1": _ln(sd, prefix + "norm1"),
        "norm2": _ln(sd, prefix + "norm2"),
        "mlp": {"Dense_0": _dense(sd, prefix + "mlp.fc1"),
                "Dense_1": _dense(sd, prefix + "mlp.fc2")},
    }


def swin_encoder_tree(sd: Mapping[str, Any], depths: Sequence[int],
                      prefix: str = "", with_head: bool = True) -> Dict:
    """Full SwinV2 tree (reference model.py:557-728 SwinTransformerV2_VAE's
    swin part: ``patch_embed/layers.{i}/norm/head``) -> SwinTransformerV2.

    Handles the scan layout: even-depth stages run as a scanned (no-shift,
    shift) block pair, so per-pair trees are stacked along a leading axis
    under ``stage_i/pairs/block_{0,1}``; odd-depth stages keep ``block_i``.
    """
    g = lambda n: _t(sd[prefix + n])
    params: Dict[str, Any] = {
        "patch_embed": {
            # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
            "proj": {"kernel": g("patch_embed.proj.weight")
                     .transpose(2, 3, 1, 0),
                     "bias": g("patch_embed.proj.bias")},
        },
        "norm": _ln(sd, prefix + "norm"),
    }
    if prefix + "patch_embed.norm.weight" in sd:
        params["patch_embed"]["norm"] = _ln(sd, prefix + "patch_embed.norm")
    if with_head and prefix + "head.weight" in sd:
        params["head"] = _dense(sd, prefix + "head")

    for i, depth in enumerate(depths):
        base = f"{prefix}layers.{i}."
        stage: Dict[str, Any] = {}
        if depth % 2 == 0 and depth >= 2:
            pairs = [{
                "block_0": swin_block_tree(sd, f"{base}blocks.{2 * j}."),
                "block_1": swin_block_tree(sd, f"{base}blocks.{2 * j + 1}."),
            } for j in range(depth // 2)]
            stage["pairs"] = _stack(pairs)
        else:
            for j in range(depth):
                stage[f"block_{j}"] = swin_block_tree(sd,
                                                      f"{base}blocks.{j}.")
        if f"{base}downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "reduction": _dense(sd, f"{base}downsample.reduction"),
                "norm": _ln(sd, f"{base}downsample.norm"),
            }
        params[f"stage_{i}"] = stage
    return params


# ---------------------------------------------------------------------------
# MLP VAE (reference model.py:602-718) — models/struct_nets.MlpVae
# ---------------------------------------------------------------------------


def vae_tree(sd: Mapping[str, Any], prefix: str = "") -> Dict:
    """Reference ``fc1..fc6 / fc31+fc32`` -> MlpVae ``enc*/mu/logvar/dec*``."""
    return {
        "enc1": _dense(sd, prefix + "fc1"),
        "enc2": _dense(sd, prefix + "fc2"),
        "mu": _dense(sd, prefix + "fc31"),
        "logvar": _dense(sd, prefix + "fc32"),
        "dec1": _dense(sd, prefix + "fc4"),
        "dec2": _dense(sd, prefix + "fc5"),
        "dec3": _dense(sd, prefix + "fc6"),
    }


# ---------------------------------------------------------------------------
# SwinFusion blocks (V1-style attention + rel-pos table) — nn/swinfusion.py
# ---------------------------------------------------------------------------


def fusion_block_tree(sd: Mapping[str, Any], prefix: str = "",
                      qkv_bias: bool = True) -> Dict:
    """``SwinTransformerBlock_fusion`` (swinfusion_module.py:265-398) ->
    FusionBlock's flat param names (1, C)-row layout for the fused
    kernels)."""
    g = lambda n: _t(sd[prefix + n])
    row = lambda x: x.reshape(1, -1)
    out = {
        "norm1_scale": row(g("norm1.weight")),
        "norm1_bias": row(g("norm1.bias")),
        "qkv_kernel": g("attn.qkv.weight").T,
        "proj_kernel": g("attn.proj.weight").T,
        "proj_bias": row(g("attn.proj.bias")),
        "norm2_scale": row(g("norm2.weight")),
        "norm2_bias": row(g("norm2.bias")),
        "fc1_kernel": g("mlp.fc1.weight").T,
        "fc1_bias": row(g("mlp.fc1.bias")),
        "fc2_kernel": g("mlp.fc2.weight").T,
        "fc2_bias": row(g("mlp.fc2.bias")),
        "relative_position_bias_table": g(
            "attn.relative_position_bias_table"),
    }
    if qkv_bias:
        out["qkv_bias"] = row(g("attn.qkv.bias"))
    return out


def _conv2d(sd: Mapping[str, Any], name: str) -> Dict:
    """torch Conv2d (out, in, kh, kw) -> nn/common.TorchConv tree."""
    out = {"kernel": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _t(sd[f"{name}.bias"])
    return {"conv": out}


def _basic_layer_fusion_tree(sd: Mapping[str, Any], prefix: str, depth: int,
                             block_fn) -> Dict:
    """``BasicLayer_fusion`` / ``Cross_BasicLayer`` blocks -> our
    BasicLayerFusion/CrossBasicLayer (scanned block pairs for even depth)."""
    if depth % 2 == 0 and depth >= 2:
        pairs = [{
            "block_0": block_fn(sd, f"{prefix}blocks.{2 * j}."),
            "block_1": block_fn(sd, f"{prefix}blocks.{2 * j + 1}."),
        } for j in range(depth // 2)]
        return {"pairs": _stack(pairs)}
    return {f"block_{j}": block_fn(sd, f"{prefix}blocks.{j}.")
            for j in range(depth)}


def rstb_tree(sd: Mapping[str, Any], prefix: str, depth: int) -> Dict:
    """``RSTB`` (swinfusion_module.py:750-824) -> nn/swinfusion.RSTB. The
    reference's ``conv``/``patch_embed`` members are dead in its forward
    (793: ``residual_group(x) + x``) and are skipped."""
    return {"residual_group": _basic_layer_fusion_tree(
        sd, prefix + "residual_group.", depth, fusion_block_tree)}


def crstb_tree(sd: Mapping[str, Any], prefix: str, depth: int) -> Dict:
    """``CRSTB`` (swinfusion_module.py:826-939) -> nn/swinfusion.CRSTB
    (per-modality groups + the cross group; ``conv_A/B`` are dead code)."""
    return {
        "residual_group_A": _basic_layer_fusion_tree(
            sd, prefix + "residual_group_A.", depth, fusion_block_tree),
        "residual_group_B": _basic_layer_fusion_tree(
            sd, prefix + "residual_group_B.", depth, fusion_block_tree),
        "residual_group": _basic_layer_fusion_tree(
            sd, prefix + "residual_group.", depth, cross_fusion_block_tree),
    }


def swinfusion_backbone_tree(sd: Mapping[str, Any],
                             ex_depths: Sequence[int],
                             fusion_depths: Sequence[int],
                             re_depths: Sequence[int],
                             prefix: str = "") -> Dict:
    """Full ``SwinFusion`` feature path (reference model.py:1131-1534, minus
    the final swin classifier) -> models/swinfusion_net.SwinFusionBackbone.

    Maps the shared A conv stem (the reference applies it to both
    modalities, model.py:1406), the shared patch_embed LayerNorm, the
    Ex/Fusion/Re RSTB/CRSTB stacks, and the collapse convs. The unused
    ``conv_first*_B`` stems are skipped."""
    params: Dict[str, Any] = {
        "conv_first1_A": _conv2d(sd, prefix + "conv_first1_A"),
        "conv_first2_A": _conv2d(sd, prefix + "conv_first2_A"),
        "patch_norm": _ln(sd, prefix + "patch_embed.norm"),
        "norm_Ex_A": _ln(sd, prefix + "norm_Ex_A"),
        "norm_Ex_B": _ln(sd, prefix + "norm_Ex_B"),
        "norm_Fusion_A": _ln(sd, prefix + "norm_Fusion_A"),
        "norm_Fusion_B": _ln(sd, prefix + "norm_Fusion_B"),
        "norm_Re": _ln(sd, prefix + "norm_Re"),
        "conv_after_body_Fusion": _conv2d(sd,
                                          prefix + "conv_after_body_Fusion"),
        "conv_last1": _conv2d(sd, prefix + "conv_last1"),
        "conv_last2": _conv2d(sd, prefix + "conv_last2"),
        "conv_last3": _conv2d(sd, prefix + "conv_last3"),
    }
    for i, d in enumerate(ex_depths):
        params[f"Ex_A_{i}"] = rstb_tree(sd, f"{prefix}layers_Ex_A.{i}.", d)
        params[f"Ex_B_{i}"] = rstb_tree(sd, f"{prefix}layers_Ex_B.{i}.", d)
    for i, d in enumerate(fusion_depths):
        params[f"Fusion_{i}"] = crstb_tree(sd, f"{prefix}layers_Fusion.{i}.",
                                           d)
    for i, d in enumerate(re_depths):
        params[f"Re_{i}"] = rstb_tree(sd, f"{prefix}layers_Re.{i}.", d)
    return params


def swinfusion_net_tree(sd: Mapping[str, Any],
                        ex_depths: Sequence[int],
                        fusion_depths: Sequence[int],
                        re_depths: Sequence[int],
                        swin_depths: Sequence[int] = (2, 2, 6),
                        prefix: str = "") -> Dict:
    """Whole reference ``SwinFusion`` model (model.py:1131-1555) ->
    models/swinfusion_net.SwinFusionNet (backbone + SwinV2 classifier)."""
    return {
        "fusion": swinfusion_backbone_tree(sd, ex_depths, fusion_depths,
                                           re_depths, prefix),
        "swin": swin_encoder_tree(sd, swin_depths, prefix=prefix + "swin."),
    }


def time_proj_tree(sd: Mapping[str, Any], name: str) -> Dict:
    """torch ``Conv1d(T, T_out, kernel_size=1, bias=False)`` over the time
    axis (model.py:376-383) -> models/fmri_nets.TimeProj."""
    w = _t(sd[f"{name}.weight"])          # (T_out, T_in, 1)
    return {"kernel": w[:, :, 0].T}


def mult_encoder_tree(sd: Mapping[str, Any], prefix: str,
                      num_layers: int) -> Dict:
    """Reference fairseq-style ``TransformerEncoder``
    (crossmodal_transformer.py:9-96) -> nn/crossmodal.MultTransformerEncoder."""
    p: Dict[str, Any] = {}
    for i in range(num_layers):
        pre = f"{prefix}layers.{i}."
        p[f"layer_{i}"] = {
            "ln0": _ln(sd, pre + "layer_norms.0"),
            "ln1": _ln(sd, pre + "layer_norms.1"),
            "self_attn": {
                "in_proj_weight": _t(sd[pre + "self_attn.in_proj_weight"]),
                "in_proj_bias": _t(sd[pre + "self_attn.in_proj_bias"]),
                "out_proj": _dense(sd, pre + "self_attn.out_proj"),
            },
            "fc1": _dense(sd, pre + "fc1"),
            "fc2": _dense(sd, pre + "fc2"),
        }
    p["final_ln"] = _ln(sd, prefix + "layer_norm")
    return p


def transformer_net_cross_attention_tree(
        sd: Mapping[str, Any], nlevels: int, prefix: str = "",
        feature_map_size: str = "same",
        feature_map_gen: str = "convolution_ul+l",
        mixing: str = "U2L_and_L2U", concat_method: str = "concat",
        fmri_type: str = "divided_frequency") -> Dict:
    """Full ``Transformer_Net_Cross_Attention`` (reference model.py:341-552)
    -> models/fmri_nets.TransformerNetCrossAttention. Only the encoders the
    configured mixing/gen path instantiates are mapped (the reference always
    constructs all of them; unused ones stay at init)."""
    mem_layers = max(nlevels, 3)
    p: Dict[str, Any] = {
        "trans_l_with_u": mult_encoder_tree(sd, prefix + "trans_l_with_u.",
                                            nlevels),
        "trans_u_with_l": mult_encoder_tree(sd, prefix + "trans_u_with_l.",
                                            nlevels),
        "out_layer2": _dense(sd, prefix + "out_layer2"),
    }
    if feature_map_gen == "convolution_ul+l":
        p["proj_l"] = time_proj_tree(sd, prefix + "proj_l")
    if feature_map_size == "different":
        p["proj_u"] = time_proj_tree(sd, prefix + "proj_u")
    if feature_map_size == "different" or fmri_type == "timeseries_and_frequency":
        p["deconv"] = time_proj_tree(sd, prefix + "deconv")
    if mixing == "U2L_and_L2U" and concat_method == "concat":
        p["trans_mem"] = mult_encoder_tree(sd, prefix + "trans_mem.",
                                           mem_layers)
        p["out_layer1"] = _dense(sd, prefix + "out_layer1")
    elif mixing in ("U2L", "U2L_and_L2U"):
        p["trans_l_mem"] = mult_encoder_tree(sd, prefix + "trans_l_mem.",
                                             mem_layers)
    else:
        p["trans_u_mem"] = mult_encoder_tree(sd, prefix + "trans_u_mem.",
                                             mem_layers)
    return p


def _double_conv_tree(sd: Mapping[str, Any], prefix: str) -> Dict:
    """``DoubleConv`` (model.py:731-749: conv3x3 -> BN -> relu, twice) ->
    nn/unet.DoubleConv. BatchNorm running stats are intentionally dropped:
    our BatchStatNorm normalizes by batch statistics (train-mode BN)."""
    conv = lambda n: {"kernel": _t(sd[n + ".weight"]).transpose(2, 3, 1, 0)}
    bn = lambda n: {"scale": _t(sd[n + ".weight"]), "bias": _t(sd[n + ".bias"])}
    return {
        "conv1": conv(prefix + "double_conv.0"),
        "bn1": bn(prefix + "double_conv.1"),
        "conv2": conv(prefix + "double_conv.3"),
        "bn2": bn(prefix + "double_conv.4"),
    }


def unet_tree(sd: Mapping[str, Any], prefix: str = "") -> Dict:
    """Reference 4-down/4-up UNet (model.py:731-800, 846-859) ->
    nn/unet.UNet2D."""
    p: Dict[str, Any] = {"inc": _double_conv_tree(sd, prefix + "inc.")}
    for i in range(1, 5):
        p[f"down{i}"] = _double_conv_tree(
            sd, f"{prefix}down{i}.maxpool_conv.1.")
    for i in range(1, 5):
        # torch ConvTranspose2d weight (in, out, kh, kw) -> flax
        # (kh, kw, in, out), SPATIALLY FLIPPED: lax.conv_transpose applies
        # the kernel as a fractionally-strided correlation, torch as the
        # conv adjoint — verified equivalent under [::-1, ::-1]
        up = {"kernel": _t(sd[f"{prefix}up{i}.up.weight"])
              .transpose(2, 3, 0, 1)[::-1, ::-1].copy()}
        if f"{prefix}up{i}.up.bias" in sd:
            up["bias"] = _t(sd[f"{prefix}up{i}.up.bias"])
        p[f"up{i}"] = {"up": up,
                       "conv": _double_conv_tree(sd, f"{prefix}up{i}.conv.")}
    return p


def swin_unet_classifier_tree(sd: Mapping[str, Any],
                              swin_depths: Sequence[int],
                              prefix: str = "") -> Dict:
    """``SwinTransformerV2_UNet`` (model.py:802-967: UNet denoiser -> SwinV2
    -> head, swin members at top level) ->
    models/struct_nets.SwinClassifierUNet."""
    return {
        "unet": unet_tree(sd, prefix),
        "swin": swin_encoder_tree(sd, swin_depths, prefix=prefix),
    }


def transformer_block_tree(sd: Mapping[str, Any], prefix: str,
                           num_layers: int) -> Dict:
    """Reference ``Transformer_Block`` (model.py:154-192: learned-CLS
    embedding + HF BertModel) -> nn/bert.TemporalBert."""
    return {
        "cls_embedding": _dense(sd, prefix + "cls_embedding.0"),
        "bert": bert_params_from_hf(sd, num_layers, prefix=prefix + "bert."),
    }


def _dual_bert_embed_tree(sd: Mapping[str, Any], num_layers: int,
                          prefix: str = "") -> Dict:
    """Dual low/ultralow Transformer_Blocks + CLS concat projection — the
    shared front half of Two_Channels and every Func_Struct_* model
    (model.py:241-339, 1598-1628) -> models/func_struct.FmriDiagEmbed."""
    return {
        "transformer_low": transformer_block_tree(
            sd, prefix + "transformer_low.", num_layers),
        "transformer_ultralow": transformer_block_tree(
            sd, prefix + "transformer_ultralow.", num_layers),
        "proj_layer": _dense(sd, prefix + "proj_layer"),
    }


def transformer_net_tree(sd: Mapping[str, Any], num_layers: int,
                         prefix: str = "") -> Dict:
    """``Transformer_Net`` (model.py:194-239) ->
    models/fmri_nets.TransformerNet."""
    return {
        "transformer": transformer_block_tree(sd, prefix + "transformer.",
                                              num_layers),
        "regression_head": _dense(sd, prefix + "regression_head"),
    }


def transformer_net_two_channels_tree(sd: Mapping[str, Any], num_layers: int,
                                      prefix: str = "") -> Dict:
    """``Transformer_Net_Two_Channels`` (model.py:241-339) ->
    models/fmri_nets.TransformerNetTwoChannels."""
    tree = _dual_bert_embed_tree(sd, num_layers, prefix)
    tree["regression_head"] = _dense(sd, prefix + "regression_head")
    return tree


def funcstruct_add_tree(sd: Mapping[str, Any], num_layers: int,
                        swin_depths: Sequence[int],
                        prefix: str = "") -> Dict:
    """``Func_Struct_Add`` / ``Func_Struct_Transfer`` (model.py:3187-3552)
    -> models/func_struct.FuncStruct{Add,Transfer}. The reference classes
    ARE the swin model (patch_embed/layers/norm/head at top level), so the
    swin tree maps from the same prefix."""
    return {
        "fmri_embed": _dual_bert_embed_tree(sd, num_layers, prefix),
        "swin": swin_encoder_tree(sd, swin_depths, prefix=prefix),
    }


def funcstruct_cross_tree(sd: Mapping[str, Any], num_layers: int,
                          ex_depths: Sequence[int],
                          fusion_depths: Sequence[int],
                          re_depths: Sequence[int],
                          swin_depths: Sequence[int],
                          prefix: str = "") -> Dict:
    """The FLAGSHIP ``Func_Struct_Cross`` (reference model.py:1558-2020:
    dual temporal BERTs -> CLS concat + proj -> diag/FC embedding ->
    SwinFusion backbone with struct -> SwinV2 head) ->
    models/func_struct.FuncStructCross."""
    return {
        "fmri_embed": _dual_bert_embed_tree(sd, num_layers, prefix),
        "fusion": swinfusion_backbone_tree(sd, ex_depths, fusion_depths,
                                           re_depths, prefix),
        "swin": swin_encoder_tree(sd, swin_depths, prefix=prefix + "swin."),
    }


def cross_fusion_block_tree(sd: Mapping[str, Any], prefix: str = "",
                            qkv_bias: bool = True) -> Dict:
    """``Cross_SwinTransformerBlock`` (swinfusion_module.py:400-558) ->
    CrossFusionBlock's per-stream (A/B) flat param names."""
    g = lambda n: _t(sd[prefix + n])
    row = lambda x: x.reshape(1, -1)
    out: Dict[str, np.ndarray] = {}
    for s in ("A", "B"):
        out.update({
            f"norm1_{s}_scale": row(g(f"norm1_{s}.weight")),
            f"norm1_{s}_bias": row(g(f"norm1_{s}.bias")),
            f"q_{s}_kernel": g(f"attn_{s}.q.weight").T,
            f"kv_{s}_kernel": g(f"attn_{s}.kv.weight").T,
            f"proj_{s}_kernel": g(f"attn_{s}.proj.weight").T,
            f"proj_{s}_bias": row(g(f"attn_{s}.proj.bias")),
            f"norm2_{s}_scale": row(g(f"norm2_{s}.weight")),
            f"norm2_{s}_bias": row(g(f"norm2_{s}.bias")),
            f"fc1_{s}_kernel": g(f"mlp_{s}.fc1.weight").T,
            f"fc1_{s}_bias": row(g(f"mlp_{s}.fc1.bias")),
            f"fc2_{s}_kernel": g(f"mlp_{s}.fc2.weight").T,
            f"fc2_{s}_bias": row(g(f"mlp_{s}.fc2.bias")),
            f"relative_position_bias_table_{s}": g(
                f"attn_{s}.relative_position_bias_table"),
        })
        if qkv_bias:
            out[f"q_{s}_bias"] = row(g(f"attn_{s}.q.bias"))
            out[f"kv_{s}_bias"] = row(g(f"attn_{s}.kv.bias"))
    return out
