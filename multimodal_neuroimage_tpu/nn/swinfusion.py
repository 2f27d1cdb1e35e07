"""SwinFusion (SwinIR-style) fusion blocks: RSTB / CRSTB with V1 window
attention and bidirectional cross-window attention.

Re-implements the reference's swinfusion module family
(reference modules/swinfusion_module.py) TPU-first:

 * Swin-V1 dot-product window attention with a learned relative position
   bias table (swinfusion_module.py:65-161)
 * Cross_WindowAttention: q from x, k/v from y (163-262, esp. 203-223)
 * pre-norm blocks with cyclic shift + SW-MSA masks (265-398)
 * Cross_SwinTransformerBlock: bidirectional A<->B window cross-attention
   with per-stream norms/MLPs (400-558)
 * BasicLayer / Cross_BasicLayer alternating shift 0 / ws//2 (609-747)
 * RSTB identity-residual group (750-824 — the ``conv`` defined there is
   never applied in forward, so it is not replicated here)
 * CRSTB = intra-modal RSTB x2 + inter-modal cross layer with residuals
   (826-939, forward 916-928)

Layout: tokens ride as (B, nW, N, C) after a pure reshape/transpose window
split (batch axis leading for GSPMD sharding); the SwinFusion pipeline keeps
pixel-resolution tokens (84x84, window 6), matching the reference where
``PatchEmbed_fusion`` is a flatten (941-1015) and x_size == img_size.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_neuroimage_tpu.nn.common import (LayerNorm, scan_body,
                                                 transition_permutation_fn,
                                                 trunc_normal_init,
                                                 window_partition,
                                                 window_perm_indices,
                                                 window_reverse)
from multimodal_neuroimage_tpu.nn.swin2d import (relative_position_index,
                                                 shift_attn_mask)

# Inter-block glue for the fused kernels (env FUSION_GLUE):
#   "chain" — reshape -> roll -> window_partition -> pad (and inverse): ~4
#             XLA ops each way, fused by XLA into a couple of kernels.
#   "perm"  — ONE static gather each way (window_perm_indices). Pad rows
#             carry token-0 values instead of zeros; the kernels mask pad
#             keys via the -1e9 bias columns and give pad rows zero
#             cotangent, so valid outputs and gradients are identical
#             (tests/test_fusion_megakernel.py::test_glue_perm_matches_chain).
_GLUE_MODE = os.environ.get("FUSION_GLUE", "chain")

# Kernel layout for the fused blocks (env FUSION_LAYOUT):
#   "std" — (B, nW, NP, C) per-sample grid cells (ops/fusion_block.py).
#   "bp"  — batch-lane-packed: the batch rides the VPU lane axis
#           (ops/fusion_block_bp.py). Streams are GROUP-MAJOR
#           (ngroups, L, G*C) between blocks and (ngroups, nW, NP, G*C)
#           into the kernels, so the lane-split transpose is paid once per
#           stack, not per kernel call (round-5 glue attack).
#   "bpr" — bp + WINDOW-RESIDENT stacks: the stream stays in padded-window
#           layout across the whole stack; consecutive blocks are glued by
#           ONE composed-permutation gather (window_transition_indices)
#           instead of an exit + entry pair, halving inter-block glue.
#   "xbp" — plain-XLA twin (no Pallas in the fusion blocks): the batched
#           (B, nW, N, C) einsum formulation in bf16, raced as a 4th plan.
#           Useful-only FLOPs (no 48x lane-pack redundancy) at whatever MXU
#           efficiency XLA reaches on the tiny hd=2 contractions — the
#           measured answer to VERDICT r4 #3's open question. BERT and the
#           SwinV2 head keep their fused kernels.
# Unset (None) behaves as "std" until ops/autoplan.resolve_plans() picks a
# plan for the live backend (bpr on TPU when its canary compiles, std
# otherwise). Tests monkeypatch this global directly.
_LAYOUT = os.environ.get("FUSION_LAYOUT")

# Stream dtype inside the fused BP/BPR stacks. The flagship's struct branch
# reaches SwinFusion as f32 (FC/VAE numerics upstream want f32), and a f32
# stream makes EVERY kernel dot an f32 MXU op — the round-3 jaxpr census
# measured 3.1 TFLOP/step of fusion dots all running f32 while the BERT
# kernels (bf16 streams) ran bf16, and bf16 streams also halve the kernels'
# stream DMA and enable the mm16 segment dots. Casting at stack entry (and
# back at exit) keeps the module contract; gated on the TPU backend so the
# CPU layout-parity tests (std vs bp, exact) and the goldens are untouched
# — it is a compute-policy cast, the same envelope as the reference's CUDA
# AMP on these blocks. FUSION_STREAM16=0 pins f32 streams on TPU too.
_STREAM16 = os.environ.get("FUSION_STREAM16", "1") != "0"

# The session's compute policy: set False by train/state's step builders and
# serve/predictor when the config pins compute_dtype=float32, so an explicit
# f32 run really is f32 end-to-end. Default True: standalone kernel users
# (bench micro paths, canaries) run the flagship's bf16 policy.
_POLICY16 = True


def _stream16_active() -> bool:
    if not (_STREAM16 and _POLICY16):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:                                # pragma: no cover
        return False


# Pin the stack-boundary relayouts to the bf16 side of the entry/exit casts.
# The round-5 bs=64 trace showed XLA sinking the bf16 cast BELOW the entry
# transposes (and hoisting the f32 cast ABOVE the exit ones), so every
# stack-boundary relayout ran on f32 streams — and a (B, L, 12) f32 buffer
# tiles at T(8,128) with 10.7x padding, so those copies cost ~21x the bytes
# of their bf16 group-major twins. An optimization_barrier on the bf16 value
# keeps the cast (elementwise, fusable) on the cheap side of the transpose.
# FUSION_BARRIER=0 disables for A/B.
_CAST_BARRIER = os.environ.get("FUSION_BARRIER", "1") != "0"


def _pin16(x):
    """Materialize a bf16 value before XLA can sink/hoist the cast across
    the adjacent relayout (no-op when barriers are disabled or off-TPU)."""
    if _CAST_BARRIER and x.dtype == jnp.bfloat16:
        return jax.lax.optimization_barrier(x)
    return x


class GroupLaneNorm(nn.Module):
    """LayerNorm over the channel axis that also runs DIRECTLY on group-major
    (ngroups, L, G*C) streams, normalizing each C-lane block.

    Same param names/shapes as flax LayerNorm ("scale"/"bias", (C,)) so the
    checkpoint tree is unchanged when a model swaps it in for the inter-stage
    norms. Token-major inputs reproduce nn/common.LayerNorm exactly
    (two-pass variance, eps 1e-5, rsqrt). Group-major inputs compute the
    per-block mean/var as ONE f32 matmul against kron(I_G, 1/C) — the whole
    point: a token-major (B, L, 12) f32 buffer tiles at T(8,128) with 10.7x
    padding, so every inter-stage LN/dropout/residual pass costs ~21x its
    useful bytes; the 96-lane group-major stream pads only 1.33x
    (ROADMAP round-5). The matmul mean differs from the jnp.mean chain only
    by f32 summation order (~1e-7 relative)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, t, grouped: bool = False):
        C = self.features
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if not grouped:
            mu = jnp.mean(t, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(t - mu), axis=-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        GC = t.shape[-1]
        G = GC // C
        M = jnp.asarray(np.kron(np.eye(G, dtype=np.float32),
                                np.full((C, C), 1.0 / C, np.float32)))
        mu = t @ M
        tc = t - mu
        var = (tc * tc) @ M
        return (tc * jax.lax.rsqrt(var + self.epsilon) * jnp.tile(scale, G)
                + jnp.tile(bias, G))


def _win_trans(xw, H: int, W: int, ws: int, s_from: int, s_to: int):
    """Group-major (ngroups, nW, NP, G*C) windows at shift s_from -> windows
    at shift s_to via one composed bijective gather whose VJP is the inverse
    gather — no scatter-add in the backward (transition_permutation_fn
    docstring). No-op when the shifts agree."""
    if s_from == s_to:
        return xw
    ngroups, nW, NP, GC = xw.shape
    permute = transition_permutation_fn(H, W, ws, s_from, s_to, NP, axis=1)
    return permute(xw.reshape(ngroups, -1, GC)).reshape(ngroups, nW, NP, GC)


def _bp_groups(B: int) -> int:
    from multimodal_neuroimage_tpu.ops.fusion_block_bp import group_size
    return B // group_size(B)


def _bp_enter(x):
    """(B, L, C) -> group-major (ngroups, L, G*C), lane of group g:
    j*C + c for b = g*G + j. ONE transpose per stack entry; the fused
    kernels consume this layout directly (round-5: the per-kernel-call
    _to_groups lane-split transposes were ~10% of the bs=64 step)."""
    B, L, C = x.shape
    ngroups = _bp_groups(B)
    return jnp.transpose(x.reshape(ngroups, B // ngroups, L, C),
                         (0, 2, 1, 3)).reshape(ngroups, L, -1)


def _bp_exit(x, B: int):
    """(ngroups, L, G*C) -> (B, L, C)."""
    ngroups, L, GC = x.shape
    G = B // ngroups
    return jnp.transpose(x.reshape(ngroups, L, G, GC // G),
                         (0, 2, 1, 3)).reshape(B, L, GC // G)


def _to_padded_windows(t, H: int, W: int, ws: int, shift: int, NP: int):
    """(B, L, C) token-major -> (B, nW, NP, C) padded windows."""
    B, L, C = t.shape
    N = ws * ws
    if _GLUE_MODE == "perm":
        entry, _ = window_perm_indices(H, W, ws, shift, NP)
        return jnp.take(t, jnp.asarray(entry), axis=1).reshape(B, -1, NP, C)
    t = t.reshape(B, H, W, C)
    if shift > 0:
        t = jnp.roll(t, shift=(-shift, -shift), axis=(1, 2))
    t = window_partition(t, ws)
    return jnp.pad(t, ((0, 0), (0, 0), (0, NP - N), (0, 0)))


def _from_padded_windows(t, H: int, W: int, ws: int, shift: int, NP: int):
    """(B, nW, NP, C) padded windows -> (B, L, C) token-major."""
    B, C = t.shape[0], t.shape[-1]
    N = ws * ws
    if _GLUE_MODE == "perm":
        _, exit_ = window_perm_indices(H, W, ws, shift, NP)
        return jnp.take(t.reshape(B, -1, C), jnp.asarray(exit_), axis=1)
    # lax.slice_in_dim, NOT t[:, :, :N, :]: numpy-style indexing lowers to
    # gather whose VJP is a scatter-add; the explicit slice's VJP is a pad
    t = window_reverse(jax.lax.slice_in_dim(t, 0, N, axis=2), ws, H, W)
    if shift > 0:
        t = jnp.roll(t, shift=(shift, shift), axis=(1, 2))
    return t.reshape(B, H * W, C)


def _to_padded_windows_bp(t, H: int, W: int, ws: int, shift: int, NP: int):
    """Group-major (ngroups, L, G*C) BP stream -> (ngroups, nW, NP, G*C)
    padded windows (the fused kernels' native input layout)."""
    ngroups, L, GC = t.shape
    N = ws * ws
    if _GLUE_MODE == "perm":
        entry, _ = window_perm_indices(H, W, ws, shift, NP)
        return jnp.take(t, jnp.asarray(entry), axis=1).reshape(
            ngroups, -1, NP, GC)
    t = t.reshape(ngroups, H, W, GC)
    if shift > 0:
        t = jnp.roll(t, shift=(-shift, -shift), axis=(1, 2))
    t = window_partition(t, ws)
    return jnp.pad(t, ((0, 0), (0, 0), (0, NP - N), (0, 0)))


def _from_padded_windows_bp(t, H: int, W: int, ws: int, shift: int, NP: int):
    """(ngroups, nW, NP, G*C) padded windows -> (ngroups, L, G*C) stream."""
    ngroups, nW, NP_, GC = t.shape
    N = ws * ws
    if _GLUE_MODE == "perm":
        _, exit_ = window_perm_indices(H, W, ws, shift, NP)
        return jnp.take(t.reshape(ngroups, -1, GC), jnp.asarray(exit_),
                        axis=1)
    # explicit slice: gather-free forward, pad (not scatter-add) VJP
    t = window_reverse(jax.lax.slice_in_dim(t, 0, N, axis=2), ws, H, W)
    if shift > 0:
        t = jnp.roll(t, shift=(shift, shift), axis=(1, 2))
    return t.reshape(ngroups, H * W, GC)


def _plain_window_attention(qwin, kvwin, table, rel_idx, mask, heads,
                            dropout, x_dtype):
    """Shared plain-jnp window attention over flat params: qwin (B,nW,N,C)
    queries, kvwin (B,nW,N,2C) keys/values (swinfusion_module.py:65-262)."""
    B, nW, N, C = qwin.shape
    hd = C // heads

    def split_heads(t):
        return t.reshape(B, nW, N, heads, hd).transpose(0, 1, 3, 2, 4)

    q = split_heads(qwin) * (hd ** -0.5)
    k, v = (split_heads(t) for t in jnp.split(kvwin, 2, axis=-1))
    bias_t = table[jnp.asarray(rel_idx.reshape(-1))]
    bias_t = bias_t.reshape(N, N, heads).transpose(2, 0, 1)
    attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias_t[None, None]
    if mask is not None:
        attn = attn + jnp.asarray(mask)[None, :, None]
    attn = jax.nn.softmax(attn, axis=-1).astype(x_dtype)
    attn = dropout(attn)
    o = jnp.einsum("bwhnm,bwhmd->bwhnd", attn, v)
    return o.transpose(0, 1, 3, 2, 4).reshape(B, nW, N, C)


def _windowed(fn, x, resolution: Tuple[int, int], ws: int, shift: int):
    """shift -> window split -> fn -> merge -> unshift, as pure reshapes.
    ``fn`` may change the channel count (e.g. fused-qkv in, dim out)."""
    H, W = resolution
    B, L, C = x.shape
    x = x.reshape(B, H, W, C)
    if shift > 0:
        x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
    xw = fn(window_partition(x, ws))
    x = window_reverse(xw, ws, H, W)
    if shift > 0:
        x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
    return x.reshape(B, L, -1)


class FusionBlock(nn.Module):
    """Pre-norm Swin-V1 block (swinfusion_module.py:265-398).

    Owns its parameters directly (flat, not via child Dense/LN modules) so
    the whole block — LN1 -> window attention -> proj -> DropPath residual ->
    LN2 -> MLP -> DropPath residual — can run as ONE Pallas megakernel on TPU
    (ops/fusion_block.py). A pure-jnp path over the same params serves
    non-TPU backends and parity tests."""

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
    io_windows: bool = False   # in/out already (ngroups, nW, NP, G*C), own shift
    io_groups: bool = False    # in/out group-major token stream (ngroups, L, G*C)

    def _effective(self):
        ws, shift = self.window_size, self.shift_size
        if min(self.input_resolution) <= ws:
            ws, shift = min(self.input_resolution), 0
        return ws, shift

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dp_rate=None,
                 dp_draw=None, seed_val=None):
        from multimodal_neuroimage_tpu.ops.attention import (
            fused_attention_active)
        from multimodal_neuroimage_tpu.ops import fusion_block as fb

        ws, shift = self._effective()
        H, W = self.input_resolution
        io_win = self.io_windows          # window-resident (bpr) stream
        bp = io_win or self.io_groups     # batch rides the lane axis
        if bp:
            C = self.dim
            B = x.shape[0] * (x.shape[-1] // C)   # ngroups * G
        else:
            B, L, C = x.shape
        heads = self.num_heads
        hidden = int(self.dim * self.mlp_ratio)
        mask = shift_attn_mask(H, W, ws, shift)
        N = ws * ws
        nW = (H // ws) * (W // ws)

        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        params = (
            self.param("norm1_scale", ones, (1, C)),
            self.param("norm1_bias", zeros, (1, C)),
            self.param("qkv_kernel", lecun, (C, 3 * C)),
            (self.param("qkv_bias", zeros, (1, 3 * C)) if self.qkv_bias
             else jnp.zeros((1, 3 * C), jnp.float32)),
            self.param("proj_kernel", lecun, (C, C)),
            self.param("proj_bias", zeros, (1, C)),
            self.param("norm2_scale", ones, (1, C)),
            self.param("norm2_bias", zeros, (1, C)),
            self.param("fc1_kernel", trunc_normal_init, (C, hidden)),
            self.param("fc1_bias", zeros, (1, hidden)),
            self.param("fc2_kernel", trunc_normal_init, (hidden, C)),
            self.param("fc2_bias", zeros, (1, C)),
        )
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           ((2 * ws - 1) * (2 * ws - 1), heads))
        rel_idx = relative_position_index(ws, ws)

        # per-sample DropPath scale factors for the two residual branches —
        # hoisted to ONE vectorized draw per scanned layer when the parent
        # supplies dp_draw/seed_val (per-block threefry chains inside the
        # block scan were a measured part of the non-kernel overhead)
        if dp_draw is not None:
            dp = dp_draw
        elif deterministic:
            dp = jnp.ones((B, 2), jnp.float32)
        else:
            r = self.drop_path if dp_rate is None else dp_rate
            keep = 1.0 - r
            dp = (jax.random.bernoulli(self.make_rng("droppath"), keep,
                                       (B, 2)).astype(jnp.float32) / keep)
        training = not deterministic
        rates = ((self.attn_drop if training else 0.0),
                 (self.drop if training else 0.0))

        if fused_attention_active() and _LAYOUT != "xbp":
            NP = fb.round_up(N, 8)
            bias = fb.packed_bias_from_table(table, ws, heads, NP, rel_idx)
            maskp = (None if mask is None else
                     np.pad(mask, ((0, 0), (0, NP - N), (0, NP - N))))
            if seed_val is not None:
                seed = seed_val
            elif training and max(rates) > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, 2 ** 31 - 1)
            else:
                seed = jnp.asarray(0, jnp.int32)
            interp = jax.default_backend() != "tpu"
            if bp:
                from multimodal_neuroimage_tpu.ops import fusion_block_bp \
                    as fbp
                xw = (x if io_win
                      else _to_padded_windows_bp(x, H, W, ws, shift, NP))
                out = fbp.fused_fusion_block_bp(
                    xw, params, bias, maskp, dp, seed, rates, training,
                    interpret=interp)
                return (out if io_win
                        else _from_padded_windows_bp(out, H, W, ws, shift,
                                                     NP))
            xw = _to_padded_windows(x, H, W, ws, shift, NP)
            out = fb.fused_fusion_block(
                xw, params, bias, maskp, dp, seed, rates, training,
                interpret=interp)
            return _from_padded_windows(out, H, W, ws, shift, NP)
        assert not bp, "BP layout requires the fused kernels"

        # ---- plain-jnp path over the same params (non-TPU, and the xbp
        # plain-XLA twin on TPU). Weights cast to the stream dtype so a
        # bf16 xbp stream gets bf16-rate MXU dots (identity under the f32
        # streams the CPU parity/golden tests run); LN stays f32. ----------
        (g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, b1m, w2, b2m) = params
        cd = x.dtype
        cw = lambda t: t.astype(cd)
        hd = C // heads
        shortcut = x
        h = LayerNorm(name=None, use_scale=False, use_bias=False)(x)
        h = (h * g1[0] + b1[0]).astype(cd)
        qkv = h @ cw(wqkv) + cw(bqkv)[0]

        attn_dropout = nn.Dropout(self.attn_drop)

        def window_attn(win):                       # (B, nW, N, 3C)
            return _plain_window_attention(
                win[..., :C], win[..., C:], table, rel_idx, mask, heads,
                lambda t: attn_dropout(t, deterministic=deterministic),
                x.dtype)

        o = _windowed(window_attn, qkv, self.input_resolution, ws, shift)
        a = o @ cw(wp) + cw(bp)[0]
        a = nn.Dropout(self.drop)(a, deterministic=deterministic)
        x = shortcut + (dp[:, 0][:, None, None] * a).astype(cd)
        h2 = LayerNorm(name=None, use_scale=False, use_bias=False)(x)
        h2 = (h2 * g2[0] + b2[0]).astype(cd)
        u = fb._gelu(h2 @ cw(w1) + cw(b1m)[0])
        u = nn.Dropout(self.drop)(u, deterministic=deterministic)
        z = u.astype(cd) @ cw(w2) + cw(b2m)[0]
        z = nn.Dropout(self.drop)(z, deterministic=deterministic)
        return x + (dp[:, 1][:, None, None] * z).astype(cd)


class CrossFusionBlock(nn.Module):
    """Bidirectional A<->B window cross-attention block
    (swinfusion_module.py:400-558): A attends with k/v from B and vice versa,
    separate norms/MLPs per stream."""

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
    io_windows: bool = False   # in/out already (ngroups, nW, NP, G*C), own shift
    io_groups: bool = False    # in/out group-major token stream (ngroups, L, G*C)

    def _effective(self):
        ws, shift = self.window_size, self.shift_size
        if min(self.input_resolution) <= ws:
            ws, shift = min(self.input_resolution), 0
        return ws, shift

    def _stream_params(self, s: str, C: int, hidden: int, heads: int,
                       ws: int):
        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        return {
            "g1": self.param(f"norm1_{s}_scale", ones, (1, C)),
            "b1": self.param(f"norm1_{s}_bias", zeros, (1, C)),
            "wq": self.param(f"q_{s}_kernel", lecun, (C, C)),
            "bq": (self.param(f"q_{s}_bias", zeros, (1, C)) if self.qkv_bias
                   else jnp.zeros((1, C), jnp.float32)),
            "wkv": self.param(f"kv_{s}_kernel", lecun, (C, 2 * C)),
            "bkv": (self.param(f"kv_{s}_bias", zeros, (1, 2 * C))
                    if self.qkv_bias else jnp.zeros((1, 2 * C), jnp.float32)),
            "wp": self.param(f"proj_{s}_kernel", lecun, (C, C)),
            "bp": self.param(f"proj_{s}_bias", zeros, (1, C)),
            "g2": self.param(f"norm2_{s}_scale", ones, (1, C)),
            "b2": self.param(f"norm2_{s}_bias", zeros, (1, C)),
            "w1": self.param(f"fc1_{s}_kernel", trunc_normal_init,
                             (C, hidden)),
            "b1m": self.param(f"fc1_{s}_bias", zeros, (1, hidden)),
            "w2": self.param(f"fc2_{s}_kernel", trunc_normal_init,
                             (hidden, C)),
            "b2m": self.param(f"fc2_{s}_bias", zeros, (1, C)),
            "table": self.param(f"relative_position_bias_table_{s}",
                                trunc_normal_init,
                                ((2 * ws - 1) * (2 * ws - 1), heads)),
        }

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True, dp_rate=None,
                 dp_draw=None, seed_val=None):
        from multimodal_neuroimage_tpu.ops.attention import (
            fused_attention_active)
        from multimodal_neuroimage_tpu.ops import fusion_block as fb

        ws, shift = self._effective()
        H, W = self.input_resolution
        io_win = self.io_windows          # window-resident (bpr) stream
        bp = io_win or self.io_groups     # batch rides the lane axis
        if bp:
            C = self.dim
            B = x.shape[0] * (x.shape[-1] // C)   # ngroups * G
        else:
            B, L, C = x.shape
        heads = self.num_heads
        hidden = int(self.dim * self.mlp_ratio)
        mask = shift_attn_mask(H, W, ws, shift)
        N = ws * ws
        rel_idx = relative_position_index(ws, ws)
        pA = self._stream_params("A", C, hidden, heads, ws)
        pB = self._stream_params("B", C, hidden, heads, ws)

        def tuple16(p, q):          # q supplies the kv-source LN (other stream)
            return (p["g1"], p["b1"], q["g1"], q["b1"], p["wq"], p["bq"],
                    p["wkv"], p["bkv"], p["wp"], p["bp"], p["g2"], p["b2"],
                    p["w1"], p["b1m"], p["w2"], p["b2m"])

        training = not deterministic
        rates = ((self.attn_drop if training else 0.0),
                 (self.drop if training else 0.0))

        def dp_scales():
            if deterministic:
                return jnp.ones((B, 2), jnp.float32)
            r = self.drop_path if dp_rate is None else dp_rate
            keep = 1.0 - r
            return (jax.random.bernoulli(self.make_rng("droppath"), keep,
                                         (B, 2)).astype(jnp.float32) / keep)

        if dp_draw is not None:                    # hoisted (2, B, 2) draw
            dp_A, dp_B = dp_draw[0], dp_draw[1]
        else:
            dp_A, dp_B = dp_scales(), dp_scales()

        if fused_attention_active() and _LAYOUT != "xbp":
            NP = fb.round_up(N, 8)
            bias_A = fb.packed_bias_from_table(pA["table"], ws, heads, NP,
                                               rel_idx)
            bias_B = fb.packed_bias_from_table(pB["table"], ws, heads, NP,
                                               rel_idx)
            maskp = (None if mask is None else
                     np.pad(mask, ((0, 0), (0, NP - N), (0, NP - N))))

            def seed(i):
                if seed_val is not None:           # hoisted (2,) draw
                    return seed_val[i]
                return (jax.random.randint(self.make_rng("dropout"), (),
                                           0, 2 ** 31 - 1)
                        if training and max(rates) > 0.0
                        else jnp.asarray(0, jnp.int32))

            interp = jax.default_backend() != "tpu"
            if bp:
                from multimodal_neuroimage_tpu.ops import fusion_block_bp \
                    as fbp
                xw = (x if io_win
                      else _to_padded_windows_bp(x, H, W, ws, shift, NP))
                yw = (y if io_win
                      else _to_padded_windows_bp(y, H, W, ws, shift, NP))
                out_x = fbp.fused_cross_fusion_block_bp(
                    xw, yw, tuple16(pA, pB), bias_A, maskp, dp_A, seed(0),
                    rates, training, interpret=interp)
                out_y = fbp.fused_cross_fusion_block_bp(
                    yw, xw, tuple16(pB, pA), bias_B, maskp, dp_B, seed(1),
                    rates, training, interpret=interp)
                if io_win:
                    return out_x, out_y
                return (_from_padded_windows_bp(out_x, H, W, ws, shift, NP),
                        _from_padded_windows_bp(out_y, H, W, ws, shift, NP))
            xw = _to_padded_windows(x, H, W, ws, shift, NP)
            yw = _to_padded_windows(y, H, W, ws, shift, NP)
            out_x = fb.fused_cross_fusion_block(
                xw, yw, tuple16(pA, pB), bias_A, maskp, dp_A, seed(0),
                rates, training, interpret=interp)
            out_y = fb.fused_cross_fusion_block(
                yw, xw, tuple16(pB, pA), bias_B, maskp, dp_B, seed(1),
                rates, training, interpret=interp)
            return (_from_padded_windows(out_x, H, W, ws, shift, NP),
                    _from_padded_windows(out_y, H, W, ws, shift, NP))
        assert not bp, "BP layout requires the fused kernels"

        # ---- plain-jnp path over the same params (non-TPU, and the xbp
        # plain-XLA twin on TPU; weight casts as in FusionBlock) ------------
        cd = x.dtype
        cw = lambda t: t.astype(cd)

        def ln(t, g, b):
            t = LayerNorm(name=None, use_scale=False, use_bias=False)(t)
            return (t * g[0] + b[0]).astype(cd)

        attn_dropout = nn.Dropout(self.attn_drop)
        h1x = ln(x, pA["g1"], pA["b1"])
        h1y = ln(y, pB["g1"], pB["b1"])

        def stream(p, hq, hkv, src, dp):
            q = hq @ cw(p["wq"]) + cw(p["bq"])[0]
            kv = hkv @ cw(p["wkv"]) + cw(p["bkv"])[0]
            qkv = jnp.concatenate([q, kv], axis=-1)

            def window_attn(win):
                return _plain_window_attention(
                    win[..., :C], win[..., C:], p["table"], rel_idx, mask,
                    heads,
                    lambda t: attn_dropout(t, deterministic=deterministic),
                    x.dtype)

            o = _windowed(window_attn, qkv, self.input_resolution, ws, shift)
            a = o @ cw(p["wp"]) + cw(p["bp"])[0]
            a = nn.Dropout(self.drop)(a, deterministic=deterministic)
            s = src + (dp[:, 0][:, None, None] * a).astype(cd)
            h2 = ln(s, p["g2"], p["b2"])
            u = fb._gelu(h2 @ cw(p["w1"]) + cw(p["b1m"])[0])
            u = nn.Dropout(self.drop)(u, deterministic=deterministic)
            z = u.astype(cd) @ cw(p["w2"]) + cw(p["b2m"])[0]
            z = nn.Dropout(self.drop)(z, deterministic=deterministic)
            return s + (dp[:, 1][:, None, None] * z).astype(cd)

        return (stream(pA, h1x, h1y, x, dp_A),
                stream(pB, h1y, h1x, y, dp_B))


def _dp_pairs(drop_path, depth: int) -> jnp.ndarray:
    dpr = (list(drop_path) if isinstance(drop_path, (list, tuple))
           else [float(drop_path)] * depth)
    return jnp.asarray(np.asarray(dpr, np.float32).reshape(depth // 2, 2))


def _hoisted_aux(mod, dp_pairs, B: int, deterministic: bool,
                 streams: int = 1):
    """ONE vectorized draw of every scanned block's DropPath scales and
    dropout seeds: (P, 2[, streams], B, 2) scales + (P, 2[, streams]) seeds,
    scanned on axis 0. Replaces per-block `make_rng` threefry chains inside
    the block scan (a measured part of the ~0.9 ms/block non-kernel
    overhead). uniform(u) < keep is exactly the per-block bernoulli(keep)."""
    P = int(dp_pairs.shape[0])
    mid = (streams,) if streams > 1 else ()
    shape_dp = (P, 2) + mid + (B, 2)
    shape_sd = (P, 2) + mid
    if deterministic:
        return (jnp.ones(shape_dp, jnp.float32),
                jnp.zeros(shape_sd, jnp.int32))
    keep = 1.0 - dp_pairs                                        # (P, 2)
    kb = keep.reshape((P, 2) + (1,) * (len(shape_dp) - 2))
    u = jax.random.uniform(mod.make_rng("droppath"), shape_dp)
    dp = (u < kb).astype(jnp.float32) / kb
    seeds = jax.random.randint(mod.make_rng("dropout"), shape_sd,
                               0, 2 ** 31 - 1, jnp.int32)
    return dp, seeds


def _eff_geometry(input_resolution, window_size):
    """Effective (ws, shift, NP) under the small-resolution clamp, mirroring
    FusionBlock._effective for the stack-level resident glue."""
    from multimodal_neuroimage_tpu.ops import fusion_block as fb
    ws = min(min(input_resolution), window_size)
    shift = 0 if min(input_resolution) <= window_size else window_size // 2
    return ws, shift, fb.round_up(ws * ws, 8)


class _FusionPairBody(nn.Module):
    """nn.scan body: one (no-shift, shift) block pair with traced per-depth
    DropPath rates. With ``resident`` the carry stays in shift-0 padded-
    window layout and the blocks are glued by composed-permutation
    transitions; with ``grouped`` the carry is the group-major BP stream."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    resident: bool = False
    grouped: bool = False

    @nn.compact
    def __call__(self, x, aux, deterministic):
        dp_pair, seeds = aux                 # (2, B, 2) scales / (2,) seeds
        common = dict(dim=self.dim, input_resolution=self.input_resolution,
                      num_heads=self.num_heads, window_size=self.window_size,
                      mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                      drop=self.drop, attn_drop=self.attn_drop, drop_path=1.0,
                      io_windows=self.resident, io_groups=self.grouped)
        H, W = self.input_resolution
        ws, s, _ = _eff_geometry(self.input_resolution, self.window_size)
        x = FusionBlock(shift_size=0, name="block_0", **common)(
            x, deterministic, dp_draw=dp_pair[0], seed_val=seeds[0])
        if self.resident:
            x = _win_trans(x, H, W, ws, 0, s)
        x = FusionBlock(shift_size=self.window_size // 2, name="block_1",
                        **common)(x, deterministic, dp_draw=dp_pair[1],
                                  seed_val=seeds[1])
        if self.resident:
            x = _win_trans(x, H, W, ws, s, 0)
        return x, None


class _CrossPairBody(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float

    resident: bool = False
    grouped: bool = False

    @nn.compact
    def __call__(self, carry, aux, deterministic):
        x, y = carry
        dp_pair, seeds = aux           # (2, 2, B, 2) scales / (2, 2) seeds
        common = dict(dim=self.dim, input_resolution=self.input_resolution,
                      num_heads=self.num_heads, window_size=self.window_size,
                      mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                      drop=self.drop, attn_drop=self.attn_drop, drop_path=1.0,
                      io_windows=self.resident, io_groups=self.grouped)
        H, W = self.input_resolution
        ws, s, _ = _eff_geometry(self.input_resolution, self.window_size)
        x, y = CrossFusionBlock(shift_size=0, name="block_0", **common)(
            x, y, deterministic, dp_draw=dp_pair[0], seed_val=seeds[0])
        if self.resident:
            x = _win_trans(x, H, W, ws, 0, s)
            y = _win_trans(y, H, W, ws, 0, s)
        x, y = CrossFusionBlock(shift_size=self.window_size // 2,
                                name="block_1", **common)(
            x, y, deterministic, dp_draw=dp_pair[1], seed_val=seeds[1])
        if self.resident:
            x = _win_trans(x, H, W, ws, s, 0)
            y = _win_trans(y, H, W, ws, s, 0)
        return (x, y), None


class BasicLayerFusion(nn.Module):
    """depth FusionBlocks alternating shift 0 / ws//2
    (swinfusion_module.py:609-667). Even depths run as ONE scanned block pair
    (single trace/compile regardless of depth — the stacks here are 54+
    blocks deep and XLA compile time is the binding constraint, SURVEY §7.2
    step 9); odd depths fall back to the unrolled loop."""

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
    io_groups: bool = False   # in/out already group-major (ngroups, L, G*C)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from multimodal_neuroimage_tpu.ops.attention import (
            fused_attention_active)
        bp = _LAYOUT in ("bp", "bpr") and fused_attention_active()
        resident = bp and _LAYOUT == "bpr"
        xla_twin = _LAYOUT == "xbp" and fused_attention_active()
        io_grp = self.io_groups
        assert not io_grp or bp, "io_groups requires the BP kernel layouts"
        B = (x.shape[0] * (x.shape[-1] // self.dim) if io_grp
             else x.shape[0])
        H, W = self.input_resolution
        ws, s_eff, NP = _eff_geometry(self.input_resolution, self.window_size)
        in_dtype = x.dtype
        if (bp or xla_twin) and _stream16_active():
            x = _pin16(x.astype(jnp.bfloat16))   # see _STREAM16 / _pin16
        if bp and not io_grp:
            x = _bp_enter(x)
        if resident:
            x = _to_padded_windows_bp(x, H, W, ws, 0, NP)

        def out(x):
            if resident:
                x = _from_padded_windows_bp(
                    x, H, W, ws, 0 if self.depth % 2 == 0 else cur, NP)
            if io_grp:
                return _pin16(x).astype(in_dtype)   # stay group-major
            if bp:
                return _pin16(_bp_exit(x, B)).astype(in_dtype)
            return x.astype(in_dtype)

        if self.depth % 2 == 0 and self.depth >= 2:
            scan = nn.scan(scan_body(_FusionPairBody, (3,), tag="fusion"),
                           variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True,
                                       "droppath": True},
                           in_axes=(0, nn.broadcast),
                           length=self.depth // 2)
            aux = _hoisted_aux(self, _dp_pairs(self.drop_path, self.depth),
                               B, deterministic)
            x, _ = scan(self.dim, self.input_resolution, self.num_heads,
                        self.window_size, self.mlp_ratio, self.qkv_bias,
                        self.drop, self.attn_drop, resident=resident,
                        grouped=bp, name="pairs")(x, aux, deterministic)
            return out(x)
        cur = 0
        for i in range(self.depth):
            dp = (self.drop_path[i] if isinstance(self.drop_path, (list, tuple))
                  else self.drop_path)
            if resident:
                s_i = 0 if i % 2 == 0 else s_eff
                x = _win_trans(x, H, W, ws, cur, s_i)
                cur = s_i
            x = FusionBlock(self.dim, self.input_resolution, self.num_heads,
                            self.window_size,
                            shift_size=0 if i % 2 == 0 else self.window_size // 2,
                            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                            drop=self.drop, attn_drop=self.attn_drop,
                            drop_path=dp, io_windows=resident, io_groups=bp,
                            name=f"block_{i}")(x, deterministic)
        return out(x)


class CrossBasicLayer(nn.Module):
    """depth CrossFusionBlocks alternating shift (swinfusion_module.py:669-747),
    scanned in pairs like BasicLayerFusion."""

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
    io_groups: bool = False   # in/out already group-major (ngroups, L, G*C)

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True):
        from multimodal_neuroimage_tpu.ops.attention import (
            fused_attention_active)
        bp = _LAYOUT in ("bp", "bpr") and fused_attention_active()
        resident = bp and _LAYOUT == "bpr"
        xla_twin = _LAYOUT == "xbp" and fused_attention_active()
        io_grp = self.io_groups
        assert not io_grp or bp, "io_groups requires the BP kernel layouts"
        B = (x.shape[0] * (x.shape[-1] // self.dim) if io_grp
             else x.shape[0])
        H, W = self.input_resolution
        ws, s_eff, NP = _eff_geometry(self.input_resolution, self.window_size)
        in_dtype = x.dtype
        if (bp or xla_twin) and _stream16_active():
            x = _pin16(x.astype(jnp.bfloat16))   # see _STREAM16 / _pin16
            y = _pin16(y.astype(jnp.bfloat16))
        if bp and not io_grp:
            x, y = _bp_enter(x), _bp_enter(y)
        if resident:
            x = _to_padded_windows_bp(x, H, W, ws, 0, NP)
            y = _to_padded_windows_bp(y, H, W, ws, 0, NP)

        def out2(x, y, shift):
            if resident:
                x = _from_padded_windows_bp(x, H, W, ws, shift, NP)
                y = _from_padded_windows_bp(y, H, W, ws, shift, NP)
            if io_grp:
                return (_pin16(x).astype(in_dtype),
                        _pin16(y).astype(in_dtype))   # stay group-major
            if bp:
                return (_pin16(_bp_exit(x, B)).astype(in_dtype),
                        _pin16(_bp_exit(y, B)).astype(in_dtype))
            return x.astype(in_dtype), y.astype(in_dtype)

        if self.depth % 2 == 0 and self.depth >= 2:
            scan = nn.scan(scan_body(_CrossPairBody, (3,), tag="fusion"),
                           variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True,
                                       "droppath": True},
                           in_axes=(0, nn.broadcast),
                           length=self.depth // 2)
            aux = _hoisted_aux(self, _dp_pairs(self.drop_path, self.depth),
                               B, deterministic, streams=2)
            (x, y), _ = scan(self.dim, self.input_resolution, self.num_heads,
                             self.window_size, self.mlp_ratio, self.qkv_bias,
                             self.drop, self.attn_drop, resident=resident,
                             grouped=bp, name="pairs")((x, y), aux,
                                                       deterministic)
            return out2(x, y, 0)
        cur = 0
        for i in range(self.depth):
            dp = (self.drop_path[i] if isinstance(self.drop_path, (list, tuple))
                  else self.drop_path)
            if resident:
                s_i = 0 if i % 2 == 0 else s_eff
                x = _win_trans(x, H, W, ws, cur, s_i)
                y = _win_trans(y, H, W, ws, cur, s_i)
                cur = s_i
            x, y = CrossFusionBlock(
                self.dim, self.input_resolution, self.num_heads,
                self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop, drop_path=dp,
                io_windows=resident, io_groups=bp,
                name=f"block_{i}")(x, y, deterministic)
        return out2(x, y, cur)


class RSTB(nn.Module):
    """Residual group: BasicLayerFusion + identity shortcut
    (swinfusion_module.py:750-824; forward at 793 is group(x) + x)."""

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
    io_groups: bool = False   # stream is group-major (ngroups, L, G*C)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x + BasicLayerFusion(
            self.dim, self.input_resolution, self.depth, self.num_heads,
            self.window_size, self.mlp_ratio, self.qkv_bias, self.drop,
            self.attn_drop, self.drop_path, io_groups=self.io_groups,
            name="residual_group")(x, deterministic)


class CRSTB(nn.Module):
    """Cross residual group (swinfusion_module.py:826-939): per-modality
    residual RSTB, then a cross layer, each with identity shortcuts
    (forward 916-928)."""

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
    io_groups: bool = False   # stream is group-major (ngroups, L, G*C)

    @nn.compact
    def __call__(self, x, y, deterministic: bool = True):
        common = dict(dim=self.dim, input_resolution=self.input_resolution,
                      depth=self.depth, num_heads=self.num_heads,
                      window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, drop=self.drop,
                      attn_drop=self.attn_drop, drop_path=self.drop_path,
                      io_groups=self.io_groups)
        x = x + BasicLayerFusion(**common, name="residual_group_A")(
            x, deterministic)
        y = y + BasicLayerFusion(**common, name="residual_group_B")(
            y, deterministic)
        x1, y1 = x, y
        x, y = CrossBasicLayer(**common, name="residual_group")(
            x1, y1, deterministic)
        return x + x1, y + y1
