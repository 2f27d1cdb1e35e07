"""MulT-style crossmodal transformer encoder (low <-> ultralow frequency).

Re-implements the behavior of the reference's fairseq-derived stack
(reference modules/crossmodal_transformer.py, multihead_attention.py,
position_embedding.py) used by ``Transformer_Net_Cross_Attention``
(model.py:341-552):

 * inputs scaled by sqrt(embed_dim) plus sinusoidal positional embeddings;
   positions start at 1 and timesteps whose FIRST feature equals 0 (i.e. the
   zero-padded regions) receive a zero positional vector
   (position_embedding.py:8-27, 58-59 — padding_idx semantics)
 * pre-LN encoder layers with a SHARED LayerNorm applied to q/k/v inputs
   (crossmodal_transformer.py:144-152), 4x relu FFN, residual dropouts
 * optional "future mask": upper-triangular -inf offset by 1+|src-tgt|
   (crossmodal_transformer.py:179-186)
 * softmax computed in fp32 (multihead_attention.py:120)
 * final LayerNorm after the layer stack (crossmodal_transformer.py:87-88)

Layout is batch-first (B, T, D) — the reference's (T, B, D) fairseq layout is
a CPU-era artifact; XLA prefers a leading batch for sharding.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_neuroimage_tpu.nn.common import LayerNorm, xavier_uniform_init


@lru_cache(maxsize=32)
def sinusoid_table(n_positions: int, dim: int) -> np.ndarray:
    """tensor2tensor-style table: [sin | cos] concatenated, position 0 zeroed
    (padding), positions used start at 1 (position_embedding.py:44-60)."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float32)
                  * -(math.log(10000.0) / (half - 1)))
    args = np.arange(n_positions, dtype=np.float32)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n_positions, 1), np.float32)],
                               axis=1)
    table[0] = 0.0  # padding_idx row
    return table.astype(np.float32)


def positional_embedding(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) -> (B, T, D) sinusoidal embedding; a timestep whose first
    feature is exactly 0 is treated as padding and gets the zero vector
    (reference crossmodal_transformer.py:65 uses channel 0 as the pad probe)."""
    B, T, D = x.shape
    table = jnp.asarray(sinusoid_table(T + 1, D))
    pos = jnp.arange(1, T + 1)
    emb = table[pos][None, :, :]
    not_pad = (x[:, :, 0] != 0)[:, :, None]
    return jnp.where(not_pad, emb, 0.0)


@lru_cache(maxsize=32)
def future_mask(tgt: int, src: int) -> np.ndarray:
    """Additive -inf upper-triangular mask offset by 1+|src-tgt|
    (crossmodal_transformer.py:179-186)."""
    m = np.triu(np.full((tgt, src), -np.inf, np.float32), 1 + abs(src - tgt))
    return m


class MultiheadAttention(nn.Module):
    """fairseq-style MHA: fused 3E in-projection (xavier-uniform), pre-scaled
    queries, fp32 softmax (multihead_attention.py:9-157)."""

    embed_dim: int
    num_heads: int
    attn_dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, attn_mask: Optional[np.ndarray] = None,
                 deterministic: bool = True):
        E, H = self.embed_dim, self.num_heads
        hd = E // H
        w = self.param("in_proj_weight", xavier_uniform_init, (3 * E, E))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        q = query @ w[:E].T + b[:E]
        k = key @ w[E:2 * E].T + b[E:2 * E]
        v = value @ w[2 * E:].T + b[2 * E:]
        q = q * (hd ** -0.5)

        B, Tq, _ = q.shape
        Tk = k.shape[1]

        def split(t, T):
            return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q, Tq), split(k, Tk), split(v, Tk)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        if attn_mask is not None:
            scores = scores + jnp.asarray(attn_mask)[None, None]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        probs = probs.astype(query.dtype)
        probs = nn.Dropout(self.attn_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Tq, E)
        return nn.Dense(E, kernel_init=xavier_uniform_init,
                        name="out_proj")(ctx)


class MultEncoderLayer(nn.Module):
    """Pre-LN layer with the reference's shared q/k/v LayerNorm
    (crossmodal_transformer.py:99-165)."""

    embed_dim: int
    num_heads: int
    attn_dropout: float = 0.1
    relu_dropout: float = 0.1
    res_dropout: float = 0.1
    attn_mask: bool = False

    @nn.compact
    def __call__(self, x, x_k=None, x_v=None, deterministic: bool = True):
        ln0 = LayerNorm(name="ln0")
        residual = x
        xn = ln0(x)
        mask = None
        if self.attn_mask:
            src = x.shape[1] if x_k is None else x_k.shape[1]
            mask = future_mask(x.shape[1], src)
        if x_k is None:
            h = MultiheadAttention(self.embed_dim, self.num_heads,
                                   self.attn_dropout, name="self_attn")(
                xn, xn, xn, mask, deterministic)
        else:
            kn, vn = ln0(x_k), ln0(x_v)
            h = MultiheadAttention(self.embed_dim, self.num_heads,
                                   self.attn_dropout, name="self_attn")(
                xn, kn, vn, mask, deterministic)
        h = nn.Dropout(self.res_dropout)(h, deterministic=deterministic)
        x = residual + h

        residual = x
        h = LayerNorm(name="ln1")(x)
        h = nn.relu(nn.Dense(4 * self.embed_dim,
                             kernel_init=xavier_uniform_init, name="fc1")(h))
        h = nn.Dropout(self.relu_dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dim, kernel_init=xavier_uniform_init,
                     name="fc2")(h)
        h = nn.Dropout(self.res_dropout)(h, deterministic=deterministic)
        return residual + h


class MultTransformerEncoder(nn.Module):
    """Reference TransformerEncoder (crossmodal_transformer.py:9-96).

    Self-attention stack when called with one input; crossmodal (q from x,
    k/v from y) when called with three.
    """

    embed_dim: int
    num_heads: int
    layers: int
    attn_dropout: float = 0.1
    relu_dropout: float = 0.1
    res_dropout: float = 0.1
    embed_dropout: float = 0.25
    attn_mask: bool = False

    @nn.compact
    def __call__(self, x_in, x_in_k=None, x_in_v=None,
                 deterministic: bool = True):
        scale = math.sqrt(self.embed_dim)
        x = scale * x_in + positional_embedding(x_in)
        x = nn.Dropout(self.embed_dropout)(x, deterministic=deterministic)
        if x_in_k is not None:
            x_k = scale * x_in_k + positional_embedding(x_in_k)
            x_v = scale * x_in_v + positional_embedding(x_in_v)
            x_k = nn.Dropout(self.embed_dropout)(x_k,
                                                 deterministic=deterministic)
            x_v = nn.Dropout(self.embed_dropout)(x_v,
                                                 deterministic=deterministic)
        for i in range(self.layers):
            if x_in_k is not None:
                x = MultEncoderLayer(self.embed_dim, self.num_heads,
                                     self.attn_dropout, self.relu_dropout,
                                     self.res_dropout, self.attn_mask,
                                     name=f"layer_{i}")(
                    x, x_k, x_v, deterministic)
            else:
                x = MultEncoderLayer(self.embed_dim, self.num_heads,
                                     self.attn_dropout, self.relu_dropout,
                                     self.res_dropout, self.attn_mask,
                                     name=f"layer_{i}")(
                    x, deterministic=deterministic)
        return LayerNorm(name="final_ln")(x)
