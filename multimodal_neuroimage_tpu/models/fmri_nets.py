"""Single-modality fMRI models (phases 1-2).

Re-implements (TPU-first, batch-dict calling convention) the reference's
fMRI nets:
  * Transformer_Net                 (reference model.py:194-239)  — step 1
  * Transformer_Net_Two_Channels    (model.py:241-339)            — step 2
  * Transformer_Net_Cross_Attention (model.py:341-552)            — step 2

Every model takes the full batch dict (keys per SURVEY §2.4) and returns the
reference's named-output dict, so one generic jitted train step serves all.

The reference's Conv1d/ConvTranspose1d "temporal projections" use kernel_size=1
over the TIME axis treated as channels (model.py:376-397) — i.e. a dense linear
map across time per ROI feature; implemented here as a single einsum (one MXU
matmul instead of a conv kernel launch).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from multimodal_neuroimage_tpu.nn.bert import TemporalBert
from multimodal_neuroimage_tpu.nn.common import leaky_relu, xavier_uniform_init
from multimodal_neuroimage_tpu.nn.crossmodal import MultTransformerEncoder

_kaiming = nn.initializers.kaiming_normal()


class TimeProj(nn.Module):
    """Linear projection across the time axis: (B, T, D) -> (B, T_out, D)
    (replaces Conv1d(T, T_out, kernel_size=1, bias=False), model.py:376-383)."""

    t_out: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", _kaiming, (x.shape[1], self.t_out))
        return jnp.einsum("btd,tu->bud", x, w.astype(x.dtype))


class TransformerNet(nn.Module):
    """Step-1 2DBERT: temporal BERT over (B, T, R) + linear head on the CLS
    (model.py:194-239)."""

    intermediate_vec: int = 84
    transformer_hidden_layers: int = 16
    num_heads_2DBert: int = 12
    sequence_length: int = 368
    transformer_dropout_rate: float = 0.1
    bert_intermediate_size: int = 3072
    fine_tune_task: str = "binary_classification"

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        x = batch["fmri_sequence"]
        tdict = TemporalBert(
            self.intermediate_vec, self.transformer_hidden_layers,
            self.num_heads_2DBert, self.sequence_length + 1,
            self.bert_intermediate_size,
            hidden_dropout=self.transformer_dropout_rate,
            name="transformer")(x, deterministic)
        pred = nn.Dense(1, name="regression_head")(tdict["cls"])
        return {"reconstructed_fmri_sequence": tdict["sequence"],
                "embedding_per_ROIs": tdict["cls"],
                self.fine_tune_task: pred}


class TransformerNetTwoChannels(nn.Module):
    """Step-2 two-channel BERT: separate low / ultralow encoders, CLS fusion
    by concat+projection or hadamard, optional raw encoder feeding the merge
    loss (model.py:241-339)."""

    intermediate_vec: int = 84
    transformer_hidden_layers: int = 16
    num_heads_2DBert: int = 12
    sequence_length: int = 368
    transformer_dropout_rate: float = 0.1
    bert_intermediate_size: int = 3072
    fine_tune_task: str = "binary_classification"
    concat_method: str = "concat"          # concat | hadamard (model.py:325-329)
    feature_map_size: str = "same"
    feature_map_gen: str = "no"
    use_merge_loss: bool = False

    def _bert(self, name: str, max_pos: int) -> TemporalBert:
        return TemporalBert(
            self.intermediate_vec, self.transformer_hidden_layers,
            self.num_heads_2DBert, max_pos, self.bert_intermediate_size,
            hidden_dropout=self.transformer_dropout_rate, name=name)

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        x_l = batch["fmri_lowfreq_sequence"]
        x_u = batch["fmri_ultralowfreq_sequence"]
        out: Dict = {}
        if self.use_merge_loss:
            raw = self._bert("transformer_raw", self.sequence_length + 1)(
                batch["fmri_sequence"], deterministic)
            out["processed_raw"] = raw["cls"]

        if self.feature_map_size == "different":
            # ultralow gets the shorter 128+1 position table with 0.2 dropout
            # (model.py:309-315: 128 ~ nearest multiple of 16 to 368//3)
            if self.feature_map_gen == "convolution_ul":
                x_u = TimeProj(128, name="proj_u")(x_u)
            low = self._bert("transformer_low", self.sequence_length + 1)(
                x_l, deterministic)
            ul = TemporalBert(self.intermediate_vec,
                              self.transformer_hidden_layers,
                              self.num_heads_2DBert, 128 + 1,
                              self.bert_intermediate_size,
                              hidden_dropout=0.2,
                              name="transformer_ultralow")(x_u, deterministic)
        else:
            low = self._bert("transformer_low", self.sequence_length + 1)(
                x_l, deterministic)
            ul = self._bert("transformer_ultralow", self.sequence_length + 1)(
                x_u, deterministic)

        if self.concat_method == "concat":
            cls = jnp.concatenate([low["cls"], ul["cls"]], axis=1)
            cls = nn.Dense(self.intermediate_vec, name="proj_layer")(cls)
        else:  # hadamard
            cls = low["cls"] * ul["cls"]
        out["embedding_per_ROIs"] = cls
        out[self.fine_tune_task] = nn.Dense(1, name="regression_head")(cls)
        return out


class TransformerNetCrossAttention(nn.Module):
    """Step-2 MulT crossmodal net (model.py:341-552): temporal projections,
    bidirectional L<->U crossmodal encoders, optional deconv re-expansion of
    the compressed ultralow stream, mixing (U2L_and_L2U / U2L / L2U), 3-layer
    self-attention memory, last-timestep readout + 2-layer head."""

    intermediate_vec: int = 84
    num_heads_mult: int = 12
    nlevels: int = 12
    sequence_length: int = 368
    attn_dropout: float = 0.1
    attn_dropout_u: float = 0.0
    relu_dropout: float = 0.1
    res_dropout: float = 0.1
    embed_dropout: float = 0.25
    attn_mask: bool = True
    fine_tune_task: str = "binary_classification"
    feature_map_size: str = "same"
    feature_map_gen: str = "convolution_ul+l"
    mixing: str = "U2L_and_L2U"
    concat_method: str = "concat"
    fmri_type: str = "divided_frequency"

    def _encoder(self, name: str, embed_dim: int, attn_dropout: float,
                 layers: int) -> MultTransformerEncoder:
        return MultTransformerEncoder(
            embed_dim=embed_dim, num_heads=self.num_heads_mult, layers=layers,
            attn_dropout=attn_dropout, relu_dropout=self.relu_dropout,
            res_dropout=self.res_dropout, embed_dropout=self.embed_dropout,
            attn_mask=self.attn_mask, name=name)

    @nn.compact
    def __call__(self, batch: Dict, deterministic: bool = True) -> Dict:
        x_l = batch["fmri_lowfreq_sequence"]
        x_u = batch["fmri_ultralowfreq_sequence"]
        d = self.intermediate_vec
        layers = self.nlevels

        drop = nn.Dropout(self.embed_dropout)
        if self.feature_map_size == "different":
            if self.feature_map_gen == "convolution_ul+l":
                proj_l = TimeProj(self.sequence_length, name="proj_l")(
                    drop(x_l, deterministic=deterministic))
                proj_u = TimeProj(self.sequence_length // 2, name="proj_u")(x_u)
            else:  # convolution_ul
                proj_l = drop(x_l, deterministic=deterministic)
                proj_u = TimeProj(self.sequence_length // 2, name="proj_u")(x_u)
        else:
            if self.feature_map_gen == "convolution_ul+l":
                # reference reuses proj_l for BOTH streams here (model.py:484-488)
                tp = TimeProj(self.sequence_length, name="proj_l")
                proj_l = tp(drop(x_l, deterministic=deterministic))
                proj_u = tp(x_u)
            else:  # 'no'
                proj_l = drop(x_l, deterministic=deterministic)
                proj_u = x_u

        # bidirectional crossmodal attention (model.py:489-490)
        h_l_with_us = self._encoder("trans_l_with_u", d, self.attn_dropout_u,
                                    layers)(proj_l, proj_u, proj_u,
                                            deterministic)
        h_u_with_ls = self._encoder("trans_u_with_l", d, self.attn_dropout,
                                    layers)(proj_u, proj_l, proj_l,
                                            deterministic)
        if (self.feature_map_size == "different"
                or self.fmri_type == "timeseries_and_frequency"):
            h_u_with_ls = TimeProj(self.sequence_length, name="deconv")(
                h_u_with_ls)

        mem_layers = max(layers, 3)
        if self.mixing == "U2L_and_L2U":
            if self.concat_method == "concat":
                h = jnp.concatenate([h_l_with_us, h_u_with_ls], axis=2)
                h = self._encoder("trans_mem", 2 * d, self.attn_dropout,
                                  mem_layers)(h, deterministic=deterministic)
                out_cls = nn.Dense(d, kernel_init=xavier_uniform_init,
                                   name="out_layer1")(h[:, -1])
            else:  # hadamard
                h = h_l_with_us * h_u_with_ls
                h = self._encoder("trans_l_mem", d, self.attn_dropout,
                                  mem_layers)(h, deterministic=deterministic)
                out_cls = h[:, -1]
        elif self.mixing == "U2L":
            h = self._encoder("trans_l_mem", d, self.attn_dropout,
                              mem_layers)(h_l_with_us,
                                          deterministic=deterministic)
            out_cls = h[:, -1]
        else:  # L2U
            h = self._encoder("trans_u_mem", d, self.attn_dropout_u,
                              mem_layers)(h_u_with_ls,
                                          deterministic=deterministic)
            out_cls = h[:, -1]

        pred = nn.Dense(1, kernel_init=xavier_uniform_init,
                        name="out_layer2")(out_cls)
        return {"embedding_per_ROIs": out_cls, self.fine_tune_task: pred}
