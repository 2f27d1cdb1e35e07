"""Swin Transformer V2 encoder for 84x84 structural matrices.

Re-implements the behavior of the reference's SwinV2 stack
(reference modules/swin_v2_module.py + model.py:970-1129) TPU-first:

 * scaled-cosine window attention with a per-head learned ``logit_scale``
   clamped at log(1/0.01) (swin_v2_module.py:87, 152-156)
 * continuous log-spaced relative position bias via a small MLP
   (``cpb_mlp``, swin_v2_module.py:91-111, 158-163), 16*sigmoid scaling
 * qkv projection without bias plus separate learnable q/v biases
   (swin_v2_module.py:126-132, 145-148)
 * res-post-norm blocks with zero-initialised norms
   (swin_v2_module.py:299-302, 446-451)
 * cyclic shift + static SW-MSA masks (swin_v2_module.py:244-266)
 * patch merging between stages (swin_v2_module.py:325-364)

TPU design notes: windows are kept as a (B, nW, N, C) axis split by pure
reshape/transpose (XLA folds these into the attention fusion); the batch axis
stays leading for clean GSPMD data-parallel sharding; shift masks are baked as
compile-time constants instead of registered buffers.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_neuroimage_tpu.nn.common import (scan_body,
    LayerNorm, 
    DropPath, Mlp, trunc_normal_init, window_partition, window_reverse)


@lru_cache(maxsize=64)
def relative_coords_table(ws_h: int, ws_w: int,
                          pretrained_ws: int = 0) -> np.ndarray:
    """Log-spaced continuous relative coordinates, (1, 2H-1, 2W-1, 2)
    (swin_v2_module.py:96-111)."""
    h = np.arange(-(ws_h - 1), ws_h, dtype=np.float32)
    w = np.arange(-(ws_w - 1), ws_w, dtype=np.float32)
    table = np.stack(np.meshgrid(h, w, indexing="ij"), axis=-1)[None]
    denom_h = (pretrained_ws - 1) if pretrained_ws > 0 else (ws_h - 1)
    denom_w = (pretrained_ws - 1) if pretrained_ws > 0 else (ws_w - 1)
    table[..., 0] /= max(denom_h, 1)
    table[..., 1] /= max(denom_w, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table


@lru_cache(maxsize=64)
def relative_position_index(ws_h: int, ws_w: int) -> np.ndarray:
    """(N, N) index into the flattened (2H-1)(2W-1) bias table
    (swin_v2_module.py:113-124)."""
    coords = np.stack(np.meshgrid(np.arange(ws_h), np.arange(ws_w),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws_h - 1
    rel[:, :, 1] += ws_w - 1
    rel[:, :, 0] *= 2 * ws_w - 1
    return rel.sum(-1)


@lru_cache(maxsize=64)
def shift_attn_mask(H: int, W: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """Additive (-100/0) mask per window for shifted windows, (nW, N, N)
    (swin_v2_module.py:244-266). Static — computed once per (H, W, ws, shift)."""
    if shift == 0:
        return None
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttentionV2(nn.Module):
    """Scaled-cosine window MHSA with continuous position bias.

    Input: (B, nW, N, C); the window axis rides along as a batch dim so one
    einsum covers every window of every sample (MXU-friendly batched matmul).
    """

    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    pretrained_window_size: int = 0

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True):
        B, nW, N, C = x.shape
        heads, hd = self.num_heads, self.dim // self.num_heads

        qkv_kernel = self.param("qkv_kernel", trunc_normal_init,
                                (C, 3 * self.dim))
        qkv = x @ qkv_kernel
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias
        qkv = qkv.reshape(B, nW, N, 3, heads, hd)
        q, k, v = [qkv[:, :, :, i].transpose(0, 1, 3, 2, 4) for i in range(3)]

        # cosine attention (swin_v2_module.py:152-156)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        logit_scale = self.param(
            "logit_scale",
            lambda rng, shape: jnp.full(shape, math.log(10.0)),
            (heads, 1, 1))
        logit_scale = jnp.exp(jnp.clip(logit_scale, max=math.log(1.0 / 0.01)))

        # continuous relative position bias (swin_v2_module.py:158-163)
        table = jnp.asarray(relative_coords_table(
            *self.window_size, self.pretrained_window_size))
        h1 = nn.Dense(512, name="cpb_fc1")(table)
        bias_table = nn.Dense(heads, use_bias=False, name="cpb_fc2")(
            nn.relu(h1)).reshape(-1, heads)
        idx = jnp.asarray(relative_position_index(*self.window_size).reshape(-1))
        rel_bias = bias_table[idx].reshape(N, N, heads).transpose(2, 0, 1)
        bias = 16.0 * jax.nn.sigmoid(rel_bias)

        from multimodal_neuroimage_tpu.ops.attention import (
            fused_attention_active, fused_window_attention)
        if fused_attention_active():
            # fold the per-head cosine logit scale into q, then reuse the
            # fused bias+mask window kernel (probabilities stay in VMEM)
            q_scaled = q * logit_scale[None, None, :, :, :]
            rate = 0.0 if deterministic else self.attn_drop
            seed = (jax.random.randint(self.make_rng("dropout"), (),
                                       0, 2 ** 31 - 1)
                    if rate > 0.0 else jnp.asarray(0, jnp.int32))
            out = fused_window_attention(
                q_scaled, k, v, bias, mask, seed, rate,
                interpret=jax.default_backend() != "tpu")
        else:
            attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                              preferred_element_type=jnp.float32)
            attn = attn * logit_scale[None, None]
            attn = attn + bias[None, None]
            if mask is not None:
                attn = attn + jnp.asarray(mask)[None, :, None]
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            attn = nn.Dropout(self.attn_drop)(attn,
                                              deterministic=deterministic)
            out = jnp.einsum("bwhnm,bwhmd->bwhnd", attn, v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, C)
        out = nn.Dense(self.dim, kernel_init=trunc_normal_init, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlockV2(nn.Module):
    """Res-post-norm Swin V2 block (swin_v2_module.py:198-304).

    ``dp_rate`` (call arg) optionally overrides the static drop_path field
    with a traced per-depth rate for scanned stacks."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 6
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    pretrained_window_size: int = 0

    def _effective(self):
        ws, shift = self.window_size, self.shift_size
        if min(self.input_resolution) <= ws:
            ws, shift = min(self.input_resolution), 0
        return ws, shift

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dp_rate=None):
        H, W = self.input_resolution
        B, L, C = x.shape
        ws, shift = self._effective()

        shortcut = x
        x = x.reshape(B, H, W, C)
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        xw = window_partition(x, ws)
        mask = shift_attn_mask(H, W, ws, shift)
        xw = WindowAttentionV2(
            self.dim, (ws, ws), self.num_heads, self.qkv_bias,
            self.attn_drop, self.drop, self.pretrained_window_size,
            name="attn")(xw, mask, deterministic)
        x = window_reverse(xw, ws, H, W)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x.reshape(B, H * W, C)
        # res-post-norm, zero-init (swin_v2_module.py:299-302, 446-451)
        x = LayerNorm(scale_init=nn.initializers.zeros, name="norm1")(x)
        x = shortcut + DropPath(self.drop_path)(x, deterministic, dp_rate)

        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, drop=self.drop,
                name="mlp")(x, deterministic)
        h = LayerNorm(scale_init=nn.initializers.zeros, name="norm2")(h)
        return x + DropPath(self.drop_path)(h, deterministic, dp_rate)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> Linear(4C->2C, no bias) -> LN
    (swin_v2_module.py:325-364; V2 order: reduce then norm)."""

    input_resolution: Tuple[int, int]
    dim: int

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        # reshape + integer indexing, NOT x[:, 0::2, 0::2]: strided slices
        # lower to lax.gather (VJP: scatter-add); y[:, :, r, :, c] is a plain
        # slice+squeeze (VJP: pad). y[b, i, r, j, c] == x[b, 2i+r, 2j+c].
        y = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = jnp.concatenate(
            [y[:, :, 0, :, 0], y[:, :, 1, :, 0], y[:, :, 0, :, 1],
             y[:, :, 1, :, 1]], axis=-1).reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.Dense(2 * self.dim, use_bias=False,
                     kernel_init=trunc_normal_init, name="reduction")(x)
        return LayerNorm(name="norm")(x)


class _SwinPairBody(nn.Module):
    """nn.scan body: (no-shift, shift) SwinV2 block pair."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    pretrained_window_size: int

    @nn.compact
    def __call__(self, x, dp_pair, deterministic):
        common = dict(dim=self.dim, input_resolution=self.input_resolution,
                      num_heads=self.num_heads, window_size=self.window_size,
                      mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                      drop=self.drop, attn_drop=self.attn_drop, drop_path=1.0,
                      pretrained_window_size=self.pretrained_window_size)
        x = SwinBlockV2(shift_size=0, name="block_0", **common)(
            x, deterministic, dp_pair[0])
        x = SwinBlockV2(shift_size=self.window_size // 2, name="block_1",
                        **common)(x, deterministic, dp_pair[1])
        return x, None


class SwinStage(nn.Module):
    """One stage: depth blocks alternating shift 0 / ws//2, optional merge
    (swin_v2_module.py:376-433). Even depths run as one scanned block pair
    (single trace per stage — compile-time lever, see nn/swinfusion.py)."""

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    downsample: bool = False
    pretrained_window_size: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.depth % 2 == 0 and self.depth >= 2:
            dpr = (list(self.drop_path)
                   if isinstance(self.drop_path, (list, tuple))
                   else [float(self.drop_path)] * self.depth)
            dp_pairs = jnp.asarray(
                np.asarray(dpr, np.float32).reshape(self.depth // 2, 2))
            scan = nn.scan(scan_body(_SwinPairBody, (3,)),
                           variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True,
                                       "droppath": True},
                           in_axes=(0, nn.broadcast),
                           length=self.depth // 2)
            x, _ = scan(self.dim, self.input_resolution, self.num_heads,
                        self.window_size, self.mlp_ratio, self.qkv_bias,
                        self.drop, self.attn_drop,
                        self.pretrained_window_size, name="pairs")(
                x, dp_pairs, deterministic)
        else:
            for i in range(self.depth):
                dp = (self.drop_path[i]
                      if isinstance(self.drop_path, (list, tuple))
                      else self.drop_path)
                x = SwinBlockV2(
                    self.dim, self.input_resolution, self.num_heads,
                    self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop=self.drop, attn_drop=self.attn_drop, drop_path=dp,
                    pretrained_window_size=self.pretrained_window_size,
                    name=f"block_{i}")(x, deterministic)
        if self.downsample:
            x = PatchMerging(self.input_resolution, self.dim,
                             name="downsample")(x)
        return x


class PatchEmbed(nn.Module):
    """Conv patchifier: (B, H, W, Cin) -> (B, nTokens, embed), LN
    (swin_v2_module.py:454-499; supports rectangular inputs)."""

    img_size: Tuple[int, int]
    patch_size: int
    embed_dim: int
    patch_norm: bool = True

    @property
    def patches_resolution(self) -> Tuple[int, int]:
        h, w = self.img_size
        ph = h // self.patch_size
        pw = max(w // self.patch_size, 1)  # reference keeps W when W < patch
        return ph, pw

    @nn.compact
    def __call__(self, x):
        h, w = self.img_size
        assert x.shape[1] == h and x.shape[2] == w, \
            f"input {x.shape[1:3]} != configured {self.img_size}"
        pw_stride = self.patch_size if w >= self.patch_size else 1
        x = nn.Conv(self.embed_dim,
                    kernel_size=(self.patch_size, pw_stride),
                    strides=(self.patch_size, pw_stride),
                    padding="VALID", kernel_init=trunc_normal_init,
                    name="proj")(x)
        B, ph, pw, C = x.shape
        x = x.reshape(B, ph * pw, C)
        if self.patch_norm:
            x = LayerNorm(name="norm")(x)
        return x


def size_preset(size_of_model: str) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Reference size presets (model.py:1003-1011)."""
    if size_of_model == "small":
        return (2,), (3,)
    if size_of_model == "medium":
        return (2, 2), (3, 6)
    return (2, 2, 6), (3, 6, 12)


class SwinTransformerV2(nn.Module):
    """Full encoder + linear head (reference model.py:970-1129):
    84x84 -> patch7 -> 12x12 tokens -> stages with patch merging ->
    LN -> token mean-pool -> Dense(1)."""

    img_size: Tuple[int, int] = (84, 84)
    patch_size: int = 7
    embed_dim: int = 12
    depths: Tuple[int, ...] = (2, 2, 6)
    num_heads: Tuple[int, ...] = (3, 6, 12)
    window_size: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    num_classes: int = 1
    patch_norm: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W) or (B, H, W, C) -> logits (B, num_classes)."""
        if x.ndim == 3:
            x = x[..., None]
        feats = self.forward_features(x, deterministic)
        return nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                        name="head")(feats)

    @nn.compact
    def forward_features(self, x, deterministic: bool = True):
        if x.ndim == 3:
            x = x[..., None]
        embed = PatchEmbed(self.img_size, self.patch_size, self.embed_dim,
                           self.patch_norm, name="patch_embed")
        res = embed.patches_resolution
        x = embed(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        n_layers = len(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            stage_res = (res[0] // (2 ** i), res[1] // (2 ** i))
            x = SwinStage(
                dim=int(self.embed_dim * 2 ** i),
                input_resolution=stage_res,
                depth=depth, num_heads=heads, window_size=self.window_size,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path=dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])],
                downsample=i < n_layers - 1,
                name=f"stage_{i}")(x, deterministic)

        x = LayerNorm(name="norm")(x)
        return x.mean(axis=1)  # AdaptiveAvgPool1d(1) over tokens (model.py:1111)
