"""Model dispatch: (task, dataset, flags) -> flax Module.

Mirrors the reference's Trainer.create_model decision tree
(reference trainer.py:176-266) over the live model classes. The reference's
``--VIT_name vit`` branch referenced an undefined ``VIT`` class
(trainer.py:198, 231 — latent NameError, SURVEY §2.3); here it maps to the
SwinV2 classifier, the intended working encoder.
"""

from __future__ import annotations

import flax.linen as nn

from multimodal_neuroimage_tpu.models.fmri_nets import (
    TransformerNet, TransformerNetCrossAttention, TransformerNetTwoChannels)
from multimodal_neuroimage_tpu.models.struct_nets import (
    SwinClassifier, SwinClassifierUNet, SwinClassifierVAE)


def _swin_kwargs(cfg) -> dict:
    return dict(size_of_model=cfg.size_of_model, patch_size=cfg.patch_size,
                swin_embed_dim=cfg.swin_embed_dim,
                window_size=cfg.window_size, mlp_ratio=cfg.mlp_ratio,
                drop_rate=cfg.drop_rate, attn_drop_rate=cfg.attn_drop_rate,
                drop_path_rate=cfg.drop_path_rate,
                fine_tune_task=cfg.fine_tune_task,
                dataset_name=cfg.dataset_name)


def _bert_kwargs(cfg) -> dict:
    return dict(intermediate_vec=cfg.intermediate_vec,
                transformer_hidden_layers=cfg.transformer_hidden_layers,
                num_heads_2DBert=cfg.num_heads_2DBert,
                sequence_length=cfg.sequence_length,
                transformer_dropout_rate=cfg.transformer_dropout_rate,
                bert_intermediate_size=cfg.bert_intermediate_size,
                fine_tune_task=cfg.fine_tune_task)


def _mult_kwargs(cfg) -> dict:
    return dict(intermediate_vec=cfg.intermediate_vec,
                num_heads_mult=cfg.num_heads_mult, nlevels=cfg.nlevels,
                sequence_length=cfg.sequence_length,
                attn_dropout=cfg.attn_dropout,
                attn_dropout_u=cfg.attn_dropout_u,
                relu_dropout=cfg.relu_dropout, res_dropout=cfg.res_dropout,
                embed_dropout=cfg.embed_dropout, attn_mask=cfg.attn_mask,
                fine_tune_task=cfg.fine_tune_task,
                feature_map_size=cfg.feature_map_size,
                feature_map_gen=cfg.feature_map_gen, mixing=cfg.mixing,
                concat_method=cfg.concat_method, fmri_type=cfg.fmri_type)


def _swin_variant(cfg) -> nn.Module:
    """Step-3 dispatch (trainer.py:228-239)."""
    if cfg.use_vae:
        return SwinClassifierVAE(**_swin_kwargs(cfg))
    if cfg.use_unet:
        return SwinClassifierUNet(**_swin_kwargs(cfg))
    return SwinClassifier(**_swin_kwargs(cfg))


def _lowfreq_variant(cfg) -> nn.Module:
    """Step-2 dispatch (trainer.py:240-246)."""
    if cfg.fmri_multimodality_type == "cross_attention":
        return TransformerNetCrossAttention(**_mult_kwargs(cfg))
    return TransformerNetTwoChannels(
        concat_method=cfg.concat_method,
        feature_map_size=cfg.feature_map_size,
        feature_map_gen=cfg.feature_map_gen,
        use_merge_loss=cfg.use_merge_loss, **_bert_kwargs(cfg))


def _funcstruct_variant(cfg) -> nn.Module:
    """Step-5 dispatch (trainer.py:247-263)."""
    from multimodal_neuroimage_tpu.models.func_struct import (
        FuncStructAdd, FuncStructCross, FuncStructTransfer,
        FuncStructUNetAdd, FuncStructUNetCross, FuncStructUNetCrossPRS)
    if cfg.multimodality_type == "add":
        cls = FuncStructUNetAdd if cfg.use_unet else FuncStructAdd
        return cls.from_config(cfg)
    if cfg.multimodality_type == "transfer":
        return FuncStructTransfer.from_config(cfg)
    # cross_attention
    if cfg.use_unet:
        cls = FuncStructUNetCrossPRS if cfg.use_prs else FuncStructUNetCross
        return cls.from_config(cfg)
    return FuncStructCross.from_config(cfg)


def create_model(cfg) -> nn.Module:
    task = cfg.task.lower()
    if task == "2dbert":
        return TransformerNet(**_bert_kwargs(cfg))
    if task == "lowfreqbert":
        return _lowfreq_variant(cfg)
    if task == "vit":
        return _swin_variant(cfg)
    if task == "funcstruct":
        return _funcstruct_variant(cfg)
    if task == "swinfusion":
        from multimodal_neuroimage_tpu.models.swinfusion_net import SwinFusionNet
        return SwinFusionNet.from_config(cfg)
    if task == "test":
        # phase-4 re-dispatch on dataset (trainer.py:179-224)
        if cfg.dataset_name in ("fMRI_timeseries", "hcp"):
            if cfg.fmri_type == "divided_frequency":
                if (cfg.model_weights_path is not None
                        and "DTI+sMRI" in str(cfg.model_weights_path)):
                    from multimodal_neuroimage_tpu.models.func_struct import (
                        FuncStructTransfer)
                    return FuncStructTransfer.from_config(cfg)
                return _lowfreq_variant(cfg)
            return TransformerNet(**_bert_kwargs(cfg))
        if cfg.dataset_name in ("DTI", "sMRI", "DTI+sMRI"):
            return _swin_variant(cfg)
        if cfg.dataset_name == "struct":
            from multimodal_neuroimage_tpu.models.swinfusion_net import SwinFusionNet
            return SwinFusionNet.from_config(cfg)
        if "multimodal" in cfg.dataset_name:
            return _funcstruct_variant(cfg)
    raise NotImplementedError(f"task {cfg.task} / dataset {cfg.dataset_name}")
