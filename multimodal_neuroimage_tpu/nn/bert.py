"""BERT-style temporal encoder over fMRI ROI timeseries.

The reference feeds ROI timeseries as ``inputs_embeds`` into a HuggingFace
``BertModel`` (reference model.py:154-192) configured with
``hidden_size = intermediate_vec`` (84/48/22), ``num_hidden_layers =
transformer_hidden_layers`` (16), 12 heads, ``max_position_embeddings =
sequence_length + 1`` and the HF defaults it does NOT override:
intermediate_size=3072, erf-GELU, layer_norm_eps=1e-12,
attention_probs_dropout_prob=0.1, post-layer-norm residuals, tanh pooler
(model.py:59-67).  This module reproduces those semantics exactly (numerical
parity with ``transformers.BertModel`` is asserted in
tests/test_bert_parity.py) while staying a pure jittable function.

TPU notes: the whole (B, T+1, H) stack is one fused XLA program; attention is
a plain batched matmul (T<=1201, H<=85 — far below the sizes where a custom
kernel wins). bf16 compute is applied by the trainer's policy, not here.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_neuroimage_tpu.nn.common import (LayerNorm, leaky_relu,
                                                 scan_body)

_bert_init = nn.initializers.normal(stddev=0.02)
LN_EPS = 1e-12

# BERT_STREAM=f32 (default): under the bf16 compute policy the 16-layer
# stacks run with an f32 RESIDUAL STREAM between the megakernels while the
# MXU dots stay bf16 (mm16 forced). Measured on v5e: full bf16 streams do
# not train at depth 16 (loss flat at ~0.67 over 150 steps — the residual/
# gradient quantizes to 8 mantissa bits at every one of the 16 layer
# boundaries) while f32 streams train to 0.006. The stack output is cast
# back to the caller's dtype, so the module contract is unchanged.
# BERT_STREAM=follow restores pure stream-dtype behavior for A/B.
_STREAM_F32 = os.environ.get("BERT_STREAM", "f32") == "f32"


class BertLayer(nn.Module):
    """One HF-semantics post-LN BERT layer over FLAT params.

    On TPU the whole layer runs as ONE Pallas megakernel per direction
    (ops/bert_layer.py) — gated on ``t_valid`` (the static valid token count
    of a TP=round_up(T,8)-padded input, set by BertEncoder). The plain-jnp
    path over the same params serves non-TPU backends and parity tests."""

    hidden: int
    heads: int
    intermediate: int = 3072
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    t_valid: Optional[int] = None      # static; set => input is pad-extended
    mm16: Optional[bool] = None        # None: follow stream dtype (kernel)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from multimodal_neuroimage_tpu.ops import bert_layer as bl
        from multimodal_neuroimage_tpu.ops.attention import (
            fused_attention, fused_attention_active)

        B, T, H = x.shape
        hd = self.hidden // self.heads
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        params = (
            self.param("query_kernel", _bert_init, (H, H)),
            self.param("query_bias", zeros, (1, H)),
            self.param("key_kernel", _bert_init, (H, H)),
            self.param("key_bias", zeros, (1, H)),
            self.param("value_kernel", _bert_init, (H, H)),
            self.param("value_bias", zeros, (1, H)),
            self.param("attn_output_kernel", _bert_init, (H, H)),
            self.param("attn_output_bias", zeros, (1, H)),
            self.param("attn_ln_scale", ones, (1, H)),
            self.param("attn_ln_bias", zeros, (1, H)),
            self.param("intermediate_kernel", _bert_init,
                       (H, self.intermediate)),
            self.param("intermediate_bias", zeros, (1, self.intermediate)),
            self.param("output_kernel", _bert_init, (self.intermediate, H)),
            self.param("output_bias", zeros, (1, H)),
            self.param("output_ln_scale", ones, (1, H)),
            self.param("output_ln_bias", zeros, (1, H)),
        )
        training = not deterministic
        rates = ((self.attn_dropout if training else 0.0),
                 (self.hidden_dropout if training else 0.0))

        if self.t_valid is not None and fused_attention_active():
            seed = (jax.random.randint(self.make_rng("dropout"), (),
                                       0, 2 ** 31 - 1)
                    if training and max(rates) > 0.0
                    else jnp.asarray(0, jnp.int32))
            return bl.bert_layer_call(
                x, params, seed, self.heads, self.t_valid, rates, training,
                interpret=jax.default_backend() != "tpu", mm16=self.mm16)

        # ---- plain path over the same params --------------------------------
        (wq, bq, wk, bk, wv, bv, wo, bo, g1, b1,
         w1, b1m, w2, b2m, g2, b2) = params
        q = x @ wq + bq[0]
        k = x @ wk + bk[0]
        v = x @ wv + bv[0]

        def split(t):
            return t.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        q = q / jnp.sqrt(jnp.asarray(hd, q.dtype))
        if fused_attention_active() and self.t_valid is None:
            # Pallas attention-only kernel: probabilities (the (B,H,T,T) hot
            # tensor, SURVEY §3.2 HOT LOOP #1) never leave VMEM.
            rate = 0.0 if deterministic else self.attn_dropout
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, 2 ** 31 - 1)
            else:
                seed = jnp.asarray(0, jnp.int32)
            ctx = fused_attention(q, k, v, seed, rate)
        else:
            scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                                preferred_element_type=jnp.float32)
            if self.t_valid is not None:
                col = jnp.arange(T)
                scores = jnp.where(col[None, None, None, :] >= self.t_valid,
                                   -1e9, scores)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            probs = nn.Dropout(self.attn_dropout)(probs,
                                                  deterministic=deterministic)
            ctx = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H)

        out = ctx @ wo + bo[0]
        out = nn.Dropout(self.hidden_dropout)(out, deterministic=deterministic)
        x = LayerNorm(epsilon=LN_EPS, use_scale=False, use_bias=False)(
            out + x) * g1[0] + b1[0]
        h = x @ w1 + b1m[0]
        h = nn.gelu(h, approximate=False)  # HF 'gelu' is the erf form
        h = h @ w2 + b2m[0]
        h = nn.Dropout(self.hidden_dropout)(h, deterministic=deterministic)
        return LayerNorm(epsilon=LN_EPS, use_scale=False, use_bias=False)(
            h + x) * g2[0] + b2[0]


class _BertScanBody(nn.Module):
    """nn.scan body: one BertLayer, carry = activations."""

    hidden: int
    heads: int
    intermediate: int
    attn_dropout: float
    hidden_dropout: float
    t_valid: Optional[int] = None
    mm16: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic):
        y = BertLayer(self.hidden, self.heads, self.intermediate,
                      self.attn_dropout, self.hidden_dropout,
                      t_valid=self.t_valid, mm16=self.mm16,
                      name="layer")(x, deterministic)
        return y, None


class BertEncoder(nn.Module):
    """``transformers.BertModel(add_pooling_layer=True)`` driven purely by
    ``inputs_embeds`` (reference model.py:175-186): learned absolute position
    embeddings + a single token-type embedding, embedding LayerNorm/dropout,
    N post-LN layers, tanh pooler on token 0.

    ``scan_layers`` stacks the N identical layers under ``lax.scan`` (params
    gain a leading depth axis) — the layer body is traced/compiled ONCE
    instead of N times, cutting XLA compile time ~N-fold for the 16-layer
    stacks. The math is identical to the unrolled loop."""

    hidden: int
    layers: int
    heads: int
    max_positions: int
    intermediate: int = 3072
    hidden_dropout: float = 0.1
    attn_dropout: float = 0.1
    scan_layers: bool = True

    @nn.compact
    def __call__(self, inputs_embeds, deterministic: bool = True):
        B, T, H = inputs_embeds.shape
        pos_table = self.param("position_embeddings", _bert_init,
                               (self.max_positions, self.hidden))
        type_table = self.param("token_type_embeddings", _bert_init,
                                (1, self.hidden))
        x = inputs_embeds + pos_table[None, :T, :] + type_table[None, :, :]
        x = LayerNorm(epsilon=LN_EPS, name="embeddings_ln")(x)
        x = nn.Dropout(self.hidden_dropout)(x, deterministic=deterministic)

        # On TPU the layers run as megakernels over a sublane-aligned padded
        # sequence (ops/bert_layer.py): pad ONCE before the stack, slice after.
        from multimodal_neuroimage_tpu.ops.attention import (
            fused_attention_active)
        from multimodal_neuroimage_tpu.ops.bert_layer import round_up
        # VMEM guard: the in-kernel (TP, TP) score tile must fit comfortably
        # (HCP's T=1201 stays on the attention-only kernel path)
        t_valid = None
        if fused_attention_active() and round_up(T, 8) <= 640:
            t_valid = T
            if T % 8 != 0:
                x = jnp.pad(x, ((0, 0), (0, round_up(T, 8) - T), (0, 0)))

        # f32 residual stream through the deep stack under the bf16 policy
        # (see _STREAM_F32): dots stay bf16 via mm16, output cast back below
        in_dtype = x.dtype
        mm16 = None
        if (t_valid is not None and _STREAM_F32
                and x.dtype == jnp.bfloat16):
            mm16, x = True, x.astype(jnp.float32)

        if self.scan_layers:
            scan = nn.scan(scan_body(_BertScanBody, (2,), tag="bert"),
                           variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           in_axes=nn.broadcast, length=self.layers)
            x, _ = scan(self.hidden, self.heads, self.intermediate,
                        self.attn_dropout, self.hidden_dropout,
                        t_valid=t_valid, mm16=mm16,
                        name="layers")(x, deterministic)
        else:
            for i in range(self.layers):
                x = BertLayer(self.hidden, self.heads, self.intermediate,
                              self.attn_dropout, self.hidden_dropout,
                              t_valid=t_valid, mm16=mm16,
                              name=f"layer_{i}")(x, deterministic)
        x = x.astype(in_dtype)
        if t_valid is not None and x.shape[1] != T:
            x = x[:, :T]

        pooled = nn.Dense(self.hidden, kernel_init=_bert_init,
                          name="pooler_dense")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled


class TemporalBert(nn.Module):
    """Reference ``Transformer_Block`` (model.py:154-192): a learnable CLS
    token produced by Linear+LeakyReLU from a constant 0.5 vector
    (model.py:161-170) is prepended, then the BERT encoder runs; returns the
    per-timestep sequence (CLS stripped) and the pooled CLS."""

    hidden: int
    layers: int
    heads: int
    max_positions: int
    intermediate: int = 3072
    hidden_dropout: float = 0.1
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        cls_const = jnp.full((B, 1, self.hidden), 0.5, dtype=x.dtype)
        cls = nn.Dense(self.hidden, kernel_init=_bert_init,
                       name="cls_embedding")(cls_const)
        cls = leaky_relu(cls)
        seq = jnp.concatenate([cls, x], axis=1)
        seq_out, pooled = BertEncoder(
            self.hidden, self.layers, self.heads, self.max_positions,
            self.intermediate, self.hidden_dropout, self.attn_dropout,
            name="bert")(seq, deterministic)
        return {"sequence": seq_out[:, 1:, :], "cls": pooled}
