"""Pallas fused SwinFusion block (TPU megakernel), self- and cross-attention.

Motivation (ROADMAP item 1): the SwinFusion stack (reference
modules/swinfusion_module.py:265-558; ours nn/swinfusion.py) runs ~60 blocks
of 84x84=7056 tokens at dim 12. At that size every XLA op is launch-overhead
bound on the tunneled v5e (~20 kernels/block x ~0.35 ms), so the whole
pre-norm block — LN1 -> window attention (+relative-position bias, +shift
mask, +attention dropout) -> proj(+dropout) -> DropPath residual -> LN2 ->
MLP(+dropout) -> DropPath residual — is fused into ONE Pallas kernel per
direction (one forward, one backward), with all weights resident in VMEM and
the (nW, N, N) probability tensors never touching HBM.

Two modes share the code path:
  * self  (``fused_fusion_block``): q, k, v all from LN1(x)
    (swinfusion_module.py:65-161, 265-398).
  * cross (``fused_cross_fusion_block``): q from LN1_x(x), k/v from LN1_y(y)
    — one directed half of the bidirectional Cross_SwinTransformerBlock
    (swinfusion_module.py:163-262, 400-558); the block calls it twice (A<-B,
    B<-A). Returns cotangents for BOTH streams.

Layout: tokens ride in *padded window layout* ``(B, nW, NP, C)`` where
``NP = round_up(ws*ws, 8)`` keeps every window an integer number of f32
sublane tiles, making the in-kernel ``(nW*NP, C) <-> (nW, NP, C)`` reshapes
tile-preserving no-ops. Pad tokens are masked out of attention via a -1e9
column pad folded into the bias; their rows carry garbage that is sliced off
on exit and receives zero cotangent on entry, so no value or gradient leaks.

The backward kernel recomputes the forward (flash-attention style) and uses
*per-draw PRNG seeding* — each dropout mask is seeded as (seed, draw_index) —
so forward and backward regenerate identical masks without materializing them
in HBM, and the backward can regenerate them in any order.

Head dim is tiny (12/6 = 2), so attention matmuls use batched
``dot_general`` over the window axis (K=2 contractions — this stack is
latency- not FLOP-bound).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5      # torch nn.LayerNorm default (reference Swin stacks)
_NEG_INF = -1e9

# self params (all 2-D, f32):
#   g1 (1,C), b1 (1,C), wqkv (C,3C), bqkv (1,3C), wp (C,C), bp (1,C),
#   g2 (1,C), b2 (1,C), w1 (C,Ch), b1m (1,Ch), w2 (Ch,C), b2m (1,C)
# cross params:
#   g1 (1,C), b1 (1,C), g1y (1,C), b1y (1,C), wq (C,C), bq (1,C),
#   wkv (C,2C), bkv (1,2C), wp, bp, g2, b2, w1, b1m, w2, b2m

# per-draw PRNG indices (seeded independently so fwd/bwd can regenerate any
# mask in any order): 0 = proj, 1/2 = mlp, 3+h = attention head h
_DRAW_PROJ, _DRAW_MLP1, _DRAW_MLP2 = 0, 1, 2


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_window_chunk(n_windows: int, NP: int,
                      budget: int = 768 * 1024) -> int:
    """Largest divisor of n_windows keeping a (Wc, NP, NP) f32 buffer with
    lane padding under ``budget``."""
    per_window = NP * max(NP, 128) * 4
    cap = max(1, budget // per_window)
    best = 1
    for w in range(1, n_windows + 1):
        if n_windows % w == 0 and w <= cap:
            best = w
    return best


def param_shapes(C: int, Ch: int, cross: bool):
    qkv = ([(1, C), (1, C), (C, C), (1, C), (C, 2 * C), (1, 2 * C)]
           if cross else [(C, 3 * C), (1, 3 * C)])
    return ([(1, C), (1, C)] + qkv
            + [(C, C), (1, C), (1, C), (1, C),
               (C, Ch), (1, Ch), (Ch, C), (1, C)])


def _n_params(cross: bool) -> int:
    return 16 if cross else 12


def _seed_draw(seed_ref, draw: int, n_draws: int = 0):
    """Per-(grid-cell, draw) seed: order-independent mask regeneration.

    Seed, cell, and draw are each mixed with a distinct large odd constant
    and combined by XOR — multiplication by an odd constant is a bijection
    mod 2^32, so distinct (seed, cell, draw) tuples stay well-dispersed even
    under int32 wraparound (the previous linear formula
    seed*(n_cells*n_draws)+cell*n_draws+draw overflowed for uniform 31-bit
    seeds and could correlate masks across layers/cells). ``n_draws`` is
    retained for call-site compatibility but no longer used.

    Used by ops/bert_layer.py, whose fwd/bwd grids are identical, and (via
    ``_prng_keep``) by the fusion kernels' default "prng" mask mode, which
    pins the backward to the forward's grid. The "hash" mode's
    ``_hash_keep*`` masks are keyed by GLOBAL token coordinates instead, so
    fwd/bwd may chunk differently and still regenerate identical masks."""
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    _prng_seed_cell(seed_ref[0], draw, cell)


def _prng_seed_cell(seed, draw: int, cell):
    """THE seed hash: each of (seed, cell, draw) mixed with a distinct large
    odd constant and XOR-combined (single definition — the BP kernels' 1-D
    grids and the BERT kernels reuse it with their own cell ids)."""
    h = (seed * jnp.int32(-1640531527)               # 0x9E3779B9 (golden)
         ^ (cell + jnp.int32(1)) * jnp.int32(461845907)
         ^ jnp.int32(draw + 1) * jnp.int32(-862048943))
    pltpu.prng_seed(h)


def _keep_scale(shape, rate: float):
    """Multiplicative dropout factor: 1/(1-rate) where kept, else 0."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thr = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return jnp.where(bits >= thr, 1.0 / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# Dropout masks — two interchangeable generators (env FUSION_MASK):
#
#  * "prng" (default): hardware PRNG, seeded per (grid cell, draw) via
#    _seed_draw; ONE random-bits op per mask. Requires the forward and the
#    merged backward kernel to run the SAME grid (enforced below) so both
#    regenerate identical masks. Since the backward merged into one kernel
#    (commit 7716ae5) this costs nothing — the per-kind chunk budgets are
#    shared between fwd and bwd.
#  * "hash": chunk-invariant counter-based masks. Each mask bit is a pure
#    function of (seed, draw index, global row, column): a murmur3-finalized
#    mix of linearly-combined coordinates, ~12 VPU passes over the tensor.
#    Any grid chunking regenerates the exact same mask — only needed when
#    fwd/bwd grids intentionally diverge (chunk-size experiments).
#
# The attention mask is the hot one: (Wc, NP, H*NP) is the largest tensor in
# the kernel, and the hash evaluates ~12 elementwise ops over it in BOTH
# forward and backward — switching to the PRNG saves ~2x12 big-tensor passes
# per block.
# ---------------------------------------------------------------------------

_MASK_MODE = os.environ.get("FUSION_MASK", "prng")


def _mode_for(interpret) -> str:
    """Resolve the mask mode for one kernel call: interpreted runs fall back
    to hash masks — the HLO interpreter (interpret=True) has no prng_seed
    primitive, and Mosaic interpret (InterpretParams) stubs prng_random_bits
    to ZEROS, which would silently drop every element. Only real TPU runs
    use _MASK_MODE. fwd/bwd share `interpret` via the custom-VJP nondiff
    args, so both resolve identically."""
    return _MASK_MODE if interpret is False else "hash"


def _prng_keep(shape, rate: float, seed, draw: int):
    """Hardware-PRNG dropout mask, reseeded per (grid cell, draw) so fwd and
    bwd (same grid) regenerate any draw independent of evaluation order."""
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    _prng_seed_cell(seed, draw, cell)
    return _keep_scale(shape, rate)


def _mix_keep(r, c, rate: float, seed, draw: int):
    """keep/(1-rate) scale from hashed (seed, draw, r, c) int32 coords."""
    v = (seed * jnp.int32(-1640531527)               # golden-ratio mix
         ^ jnp.int32(draw + 1) * jnp.int32(-862048943)
         ^ r * jnp.int32(461845907) ^ c * jnp.int32(668265261))
    u = pltpu.bitcast(v, jnp.uint32)
    u = u ^ (u >> jnp.uint32(16))                    # murmur3 fmix32
    u = pltpu.bitcast(pltpu.bitcast(u, jnp.int32)
                      * jnp.int32(-2048144789), jnp.uint32)
    u = u ^ (u >> jnp.uint32(13))
    u = pltpu.bitcast(pltpu.bitcast(u, jnp.int32)
                      * jnp.int32(-1028477387), jnp.uint32)
    u = u ^ (u >> jnp.uint32(16))
    thr = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return jnp.where(u >= thr, 1.0 / (1.0 - rate), 0.0)


def _hash_keep2(shape, rate: float, seed, draw: int, row0):
    """(R, C) mask over rows row0..row0+R of the global token matrix."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return _mix_keep(r, c, rate, seed, draw)


def _hash_keep3(shape, rate: float, seed, draw: int, w0):
    """(Wc, NP, M) attention mask for global windows w0..w0+Wc."""
    NP = shape[1]
    w = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + w0
    n = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    m = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return _mix_keep(w * NP + n, m, rate, seed, draw)


def _keep2(shape, rate: float, seed, draw: int, row0, mode: str):
    """(R, C) stream dropout mask — dispatch on the resolved mask mode."""
    if mode == "prng":
        return _prng_keep(shape, rate, seed, draw)
    return _hash_keep2(shape, rate, seed, draw, row0)


def _keep3(shape, rate: float, seed, draw: int, w0, mode: str):
    """(Wc, NP, L) attention dropout mask — dispatch on the resolved mode."""
    if mode == "prng":
        return _prng_keep(shape, rate, seed, draw)
    return _hash_keep3(shape, rate, seed, draw, w0)


def _ln_fwd(x, g, b, eps: float = _LN_EPS):
    """Exact two-pass LayerNorm (nn/common.py LayerNorm semantics)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xh = xc * r
    return xh * g + b, xh, r


def _ln_bwd(dh, xh, r, g):
    """d/dx of LayerNorm given normalized xh and rsqrt r."""
    dxh = dh * g
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xh, axis=-1, keepdims=True)
    return r * (dxh - m1 - xh * m2)


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7 — below f32
    resolution for gelu); Mosaic has no erf primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(u):
    """Exact (erf) GELU — torch nn.GELU default, which the reference's Swin
    MLPs use (swin_v2_module.py:22). Round 1 shipped the tanh approximation
    here, a 1e-3-level deviation from the reference."""
    return 0.5 * u * (1.0 + _erf(u * _INV_SQRT2))


def _gelu_grad(u):
    return (0.5 * (1.0 + _erf(u * _INV_SQRT2))
            + u * jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a^T @ b for (R, M) x (R, N) -> (M, N) (param grads)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a @ b^T for (R, N) x (M, N) -> (R, M) (input grads)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bdot(a, b, contract_a, contract_b):
    """Batched (over axis 0) contraction for window attention."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _global_keys(Wc: int, NP: int):
    """(wkey0, row0): global window / token-row offsets of this grid cell,
    unique across (sample, window) — the hash-mask coordinates that make
    dropout masks identical under any grid chunking."""
    nw_total = pl.num_programs(1) * Wc
    wkey0 = pl.program_id(0) * nw_total + pl.program_id(1) * Wc
    return wkey0, wkey0 * NP


# ---------------------------------------------------------------------------
# Head-PACKED attention: all H heads' score matrices ride side by side on one
# (Wc, NP, L=H*NP) lane axis. With C=12 / NP=40 the per-head formulation pads
# every (.., NP) buffer to 128 lanes (31% utilization) and re-runs the
# softmax/dropout chain H times; packing runs ONE softmax + ONE dropout-mask
# evaluation at ~94% lane utilization (240/256) and turns the per-head
# output/grad contractions into single K=L MXU dots. Measured VPU-bound
# (grid shell and DMA are negligible — chunk-size probes & copy-ablation).
#
# Per-head channel selection uses masked full-C dots (k masked to head h's
# channel pair) instead of hd=2 lane slices, avoiding per-head relayouts.
# Segment (per-head) softmax denominators are two tiny matmuls against the
# block indicator G (L, H). The max is subtracted per ROW (over all heads)
# rather than per segment — mathematically identical after normalization and
# safe for LN-bounded scores (underflow needs a cross-head score spread >87).
# ---------------------------------------------------------------------------

def _head_masks(C: int, H: int):
    """H lane masks (1, 1, C) selecting each head's channel block."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    hd = C // H
    return [(lane // hd == h).astype(jnp.float32) for h in range(H)]


def _seg_matrix(NP: int, H: int):
    """(L, H) block indicator: G[l, h] = 1 iff lane l is in head h's block."""
    L = H * NP
    return (jax.lax.broadcasted_iota(jnp.int32, (L, H), 0) // NP
            == jax.lax.broadcasted_iota(jnp.int32, (L, H), 1)
            ).astype(jnp.float32)


_PACK_MODE = os.environ.get("FUSION_PACK", "dot")


def _pack_kv(t3, H, mm16: bool = False):
    """(Wc, NP, C) -> head-packed (Wc, C, L): transpose, place a copy of
    each source lane into every head block, and zero channels outside each
    head's block with a single constant-mask multiply.

    Placement modes (FUSION_PACK):
      tile — H lane-concatenated copies of the (Wc, C, NP) transpose: a
             whole-40-lane-block tile, the same pattern as the in-kernel
             mask lane-tiling that cut the BP shell floor (round-3
             ROADMAP). A copy expressed as VPU concat instead of MXU work.
      dot  — ONE matmul against a constant 0/1 tile-placement matrix E.
             Round-2's choice ("lane-misaligned 6-piece concats measured
             ~2x the matmul") predates whole-block tiling; the round-4
             ablation ladder measured the 4 placement dots (~5.8 GFLOP of
             pure copying each) as a top kernel cost.
    ``mm16`` runs the dot-mode placement with bf16 operands (f32
    accumulation) — E is 0/1 so the placement itself is exact. Both modes
    produce identical f32 values."""
    Wc, NP, C = t3.shape
    hd = C // H
    L = H * NP
    if _ABLATE == "nopack":       # pack-cost probe: splat stand-in
        return jnp.full((Wc, C, L), 0.01, jnp.float32) + jnp.sum(t3) * 1e-9
    if _ABLATE == "noswap":       # transpose-cost probe: tiny-slice stand-in
        tT = jnp.broadcast_to(jnp.swapaxes(t3[:, :1, :], 1, 2), (Wc, C, NP))
    else:
        tT = jnp.swapaxes(t3, 1, 2)               # (Wc, C, NP)
    sub_c = jax.lax.broadcasted_iota(jnp.int32, (C, L), 0)
    sel = (sub_c // hd
           == jax.lax.broadcasted_iota(jnp.int32, (C, L), 1) // NP)
    if _PACK_MODE == "tile":
        tiled = jnp.concatenate([tT] * H, axis=2)        # (Wc, C, L)
    else:
        lane_m = jax.lax.broadcasted_iota(jnp.int32, (NP, L), 0)
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (NP, L), 1)
        edt = jnp.bfloat16 if mm16 else jnp.float32
        E = (lane_l % NP == lane_m).astype(edt)          # (NP, L) placement
        tiled = jax.lax.dot_general(tT.astype(edt), E,
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    if _ABLATE == "nosel":        # pack-mask-cost probe: skip the block zero
        return tiled * 1.0
    return tiled * sel.astype(jnp.float32)[None]


def _packed_scores(q3s, K_pack, bias_ref, mask_ref, H, bdot=None):
    """(Wc, NP, L) packed scores: one masked-K dot, + bias + mask.
    ``mask_ref`` arrives PRE-TILED to (Wc, NP, L) (static, built host-side).
    ``bdot`` lets bf16-operand callers (fusion_block_bp._mm) supply their
    cast-wrapped batched dot."""
    S = (bdot or _bdot)(q3s, K_pack, 2, 1)
    S = S + bias_ref[:][None]                     # bias_ref is (NP, L)
    if mask_ref is not None:
        S = S + mask_ref[:]
    return S


# Softmax logit cap replacing the per-row max subtraction: a cross-lane max
# reduce + subtract costs two full passes; clamping at 80 is one cheap
# elementwise op, exp(80) is finite in f32, and LN-bounded scores never get
# near 80 (the -1e9 pad/mask columns still underflow to exactly 0). Identical
# to max-subtracted softmax whenever all scores < _LOGIT_CAP.
_LOGIT_CAP = 80.0


def _packed_softmax(S, G, Wc, NP, L, mm16: bool = False):
    """Per-head-segment softmax over the packed lane axis.

    ``mm16`` runs the two segment dots (sum + broadcast-back) with bf16
    operands and f32 accumulation: G is 0/1 so the placement is exact, e is
    positive so the bf16 rounding of the summands is an unbiased ~2^-8
    relative wobble on the denominator — smaller than the bf16 rounding the
    downstream context dot applies to p anyway. f32 dots run at a fraction
    of the v5e MXU's bf16 rate, and at H tiny these dots are pad-dominated,
    so the cast matters despite the small FLOP count. Only enabled when the
    surrounding kernel already runs the bf16 compute policy (exact f32
    parity with the jnp twins is preserved for f32 inputs/tests)."""
    e = jnp.exp(jnp.minimum(S, _LOGIT_CAP))       # <= 5.5e34, no overflow
    if mm16:
        Gb = G.astype(jnp.bfloat16)
        den = _dot(e.reshape(Wc * NP, L).astype(jnp.bfloat16), Gb)
        rden = 1.0 / jnp.maximum(den, 1e-38)
        return e * _dot_nt(rden.astype(jnp.bfloat16),
                           Gb).reshape(Wc, NP, L)
    den = _dot(e.reshape(Wc * NP, L), G)          # (R, H) segment sums
    rden = 1.0 / jnp.maximum(den, 1e-38)
    return e * _dot_nt(rden, G).reshape(Wc, NP, L)


def _seg_rows(t, G, mm16: bool = False):
    """Packed per-head row sums for the softmax backward: (rows, L) ->
    (rows, L) where each lane carries its segment's sum of t. Same bf16-
    operand policy as _packed_softmax under ``mm16``."""
    if mm16:
        Gb = G.astype(jnp.bfloat16)
        return _dot_nt(_dot(t.astype(jnp.bfloat16), Gb).astype(jnp.bfloat16),
                       Gb)
    return _dot_nt(_dot(t, G), G)


def _unstack_heads(full, masks, NP: int):
    """(Wc, L, C) -> (Wc, NP, C): sum of per-head row blocks x lane masks."""
    H = len(masks)
    acc = full[:, 0:NP, :] * masks[0]
    for h in range(1, H):
        acc = acc + full[:, h * NP:(h + 1) * NP, :] * masks[h]
    return acc


def _forward_compute(seed_ref, x_ref, y_ref, dp_ref, bias_ref, mask_ref,
                     prefs, dims, rates, training, cross, mode):
    """Shared forward used by both kernels. Returns (out, x2r, residuals)."""
    Wc, NP, C, H, Ch = dims
    attn_rate, drop_rate = rates
    hd = C // H
    L = H * NP
    scale = hd ** -0.5
    R = Wc * NP
    seed = seed_ref[0]
    wkey0, row0 = _global_keys(Wc, NP)

    if cross:
        (g1, b1, g1y, b1y, wq, bq, wkv, bkv,
         wp, bp, g2, b2, w1, b1m, w2, b2m) = prefs
    else:
        (g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, b1m, w2, b2m) = prefs

    x = x_ref[0].astype(jnp.float32)              # (Wc, NP, C)
    x2 = x.reshape(R, C)
    if _ABLATE == "copy":                          # launch + DMA floor
        return x2, x2, None
    h1, xh1, r1 = _ln_fwd(x2, g1[:], b1[:])
    if cross:
        y2 = y_ref[0].astype(jnp.float32).reshape(R, C)
        h1y, xh1y, r1y = _ln_fwd(y2, g1y[:], b1y[:])
        q = _dot(h1, wq[:]) + bq[:]
        kv = _dot(h1y, wkv[:]) + bkv[:]
        q3 = q.reshape(Wc, NP, C)
        kv3 = kv.reshape(Wc, NP, 2 * C)
        k3, v3 = kv3[:, :, 0:C], kv3[:, :, C:2 * C]
    else:
        h1y = xh1y = r1y = None
        qkv = _dot(h1, wqkv[:]) + bqkv[:]
        qkv3 = qkv.reshape(Wc, NP, 3 * C)
        q3, k3, v3 = (qkv3[:, :, 0:C], qkv3[:, :, C:2 * C],
                      qkv3[:, :, 2 * C:])

    if _ABLATE == "noheads":                       # skip the attention loop
        o3 = q3
    else:
        K_pack = _pack_kv(k3, H)                       # (Wc, C, L)
        V_pack = _pack_kv(v3, H)
        if _ABLATE == "dotsonly":                      # dots + packs only
            o3 = _bdot(_bdot(q3 * scale, K_pack, 2, 1), V_pack, 2, 2)
        else:
            S = _packed_scores(q3 * scale, K_pack, bias_ref, mask_ref, H)
            if _ABLATE == "nosm":                      # skip the softmax
                p = S * 0.01
            else:
                p = _packed_softmax(S, _seg_matrix(NP, H), Wc, NP, L)
            if training and attn_rate > 0.0:
                p = p * _keep3(p.shape, attn_rate, seed, 3, wkey0, mode)
            o3 = _bdot(p, V_pack, 2, 2)                # (Wc, NP, C)
    o2 = o3.reshape(R, C)
    a = _dot(o2, wp[:]) + bp[:]
    if training and drop_rate > 0.0:
        a = a * _keep2(a.shape, drop_rate, seed, _DRAW_PROJ, row0,
                       mode)
    dp1 = dp_ref[pl.program_id(0), 0]
    dp2 = dp_ref[pl.program_id(0), 1]
    x2r = x2 + dp1 * a
    if _ABLATE == "nomlp":                         # skip LN2 + MLP
        return x2r, x2r, None
    h2, xh2, r2 = _ln_fwd(x2r, g2[:], b2[:])
    u = _dot(h2, w1[:]) + b1m[:]
    gu = _gelu(u)
    if training and drop_rate > 0.0:
        gu = gu * _keep2(gu.shape, drop_rate, seed, _DRAW_MLP1, row0,
                         mode)
    z = _dot(gu, w2[:]) + b2m[:]
    if training and drop_rate > 0.0:
        z = z * _keep2(z.shape, drop_rate, seed, _DRAW_MLP2, row0, mode)
    out = x2r + dp2 * z
    residuals = (x2, h1, xh1, r1, h1y, xh1y, r1y, q3, k3, v3, o2,
                 dp1, dp2, x2r)
    return out, x2r, residuals


def _make_fwd_kernel(dims, rates, training, with_mask, cross, mode):
    np_ = _n_params(cross)

    def kernel(seed_ref, x_ref, *rest):
        i = 0
        y_ref = rest[i] if cross else None
        i += 1 if cross else 0
        dp_ref, bias_ref = rest[i], rest[i + 1]
        i += 2
        mask_ref = rest[i] if with_mask else None
        i += 1 if with_mask else 0
        prefs = rest[i:i + np_]
        o_ref, x2r_ref = rest[-2], rest[-1]
        out, x2r, _ = _forward_compute(seed_ref, x_ref, y_ref, dp_ref,
                                       bias_ref, mask_ref, prefs, dims,
                                       rates, training, cross, mode)
        Wc, NP, C = dims[0], dims[1], dims[2]
        o_ref[0] = out.reshape(Wc, NP, C).astype(o_ref.dtype)
        # post-attention residual state, saved for the split MLP-side
        # backward (the bert_layer.py x1 trick): the MLP backward then never
        # touches attention and can run at a much larger window chunk
        x2r_ref[0] = x2r.reshape(Wc, NP, C).astype(x2r_ref.dtype)
    return kernel


def _make_bwd_kernel(dims, rates, training, with_mask, cross, mode):
    """ONE backward kernel per block: MLP/LN2 backward over the saved x2r
    (dx2r never leaves VMEM), then the packed attention recompute + backward.
    The round-1 split into MLP-side/attention-side kernels existed to fit the
    16 MB scoped-vmem default; with the 64 MB cap the merge removes a kernel
    launch and the dx2r + second-x2r HBM round trips per block."""
    np_ = _n_params(cross)
    n_attn = 10 if cross else 6

    def kernel(seed_ref, x_ref, *rest):
        i = 0
        y_ref = rest[i] if cross else None
        i += 1 if cross else 0
        x2r_ref, g_ref = rest[i], rest[i + 1]
        dp_ref, bias_ref = rest[i + 2], rest[i + 3]
        i += 4
        mask_ref = rest[i] if with_mask else None
        i += 1 if with_mask else 0
        prefs = rest[i:i + np_]
        outs = rest[i + np_:]
        if cross:
            (g1, b1, g1y, b1y, wq, bq, wkv, bkv, wp, bp,
             g2, b2, w1, b1m, w2, b2m) = prefs
            dx_ref, dy_ref, dbias_ref = outs[0], outs[1], outs[2]
            dp_refs = outs[3:3 + np_]
            (dg1_ref, db1_ref, dg1y_ref, db1y_ref, dwq_ref, dbq_ref,
             dwkv_ref, dbkv_ref, dwp_ref, dbp_ref,
             dg2_ref, db2_ref, dw1_ref, db1m_ref, dw2_ref,
             db2m_ref) = dp_refs
        else:
            (g1, b1, wqkv, bqkv, wp, bp,
             g2, b2, w1, b1m, w2, b2m) = prefs
            dx_ref, dbias_ref = outs[0], outs[1]
            dp_refs = outs[2:2 + np_]
            (dg1_ref, db1_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref,
             dg2_ref, db2_ref, dw1_ref, db1m_ref, dw2_ref,
             db2m_ref) = dp_refs

        Wc, NP, C, H, Ch = dims
        attn_rate, drop_rate = rates
        hd = C // H
        L = H * NP
        scale = hd ** -0.5
        R = Wc * NP
        seed = seed_ref[0]
        wkey0, row0 = _global_keys(Wc, NP)
        with_drop = training and drop_rate > 0.0

        is_first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0))

        @pl.when(is_first)
        def _():
            for ref in (dbias_ref,) + tuple(dp_refs):
                ref[:] = jnp.zeros_like(ref)

        # ---- MLP/LN2 backward over saved x2r (dx2r stays in VMEM) ------------
        x2r = x2r_ref[0].astype(jnp.float32).reshape(R, C)
        g = g_ref[0].astype(jnp.float32).reshape(R, C)
        dp2 = dp_ref[pl.program_id(0), 1]

        dz = dp2 * g
        if with_drop:
            dz = dz * _keep2(dz.shape, drop_rate, seed, _DRAW_MLP2, row0,
                             mode)
        db2m_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
        h2, xh2, r2 = _ln_fwd(x2r, g2[:], b2[:])
        u = _dot(h2, w1[:]) + b1m[:]
        gu = _gelu(u)
        if with_drop:
            m1 = _keep2(gu.shape, drop_rate, seed, _DRAW_MLP1, row0, mode)
            gu = gu * m1
        else:
            m1 = None
        dw2_ref[:] += _dot_tn(gu, dz)
        dgu = _dot_nt(dz, w2[:])
        if m1 is not None:
            dgu = dgu * m1
        du = dgu * _gelu_grad(u)
        db1m_ref[:] += jnp.sum(du, axis=0, keepdims=True)
        dw1_ref[:] += _dot_tn(h2, du)
        dh2 = _dot_nt(du, w1[:])
        dg2_ref[:] += jnp.sum(dh2 * xh2, axis=0, keepdims=True)
        db2_ref[:] += jnp.sum(dh2, axis=0, keepdims=True)
        dx2r = g + _ln_bwd(dh2, xh2, r2, g2[:])

        # ---- recompute LN1 + qkv ---------------------------------------------
        x = x_ref[0].astype(jnp.float32)
        x2 = x.reshape(R, C)
        h1, xh1, r1 = _ln_fwd(x2, g1[:], b1[:])
        if cross:
            y2 = y_ref[0].astype(jnp.float32).reshape(R, C)
            h1y, xh1y, r1y = _ln_fwd(y2, g1y[:], b1y[:])
            q3 = (_dot(h1, wq[:]) + bq[:]).reshape(Wc, NP, C)
            kv3 = (_dot(h1y, wkv[:]) + bkv[:]).reshape(Wc, NP, 2 * C)
            k3, v3 = kv3[:, :, 0:C], kv3[:, :, C:2 * C]
        else:
            qkv3 = (_dot(h1, wqkv[:]) + bqkv[:]).reshape(Wc, NP, 3 * C)
            q3, k3, v3 = (qkv3[:, :, 0:C], qkv3[:, :, C:2 * C],
                          qkv3[:, :, 2 * C:])

        # do2 depends only on dx2r (not on the attention output), so the
        # packed recompute and its backward run in one pass — p is a single
        # (Wc, NP, L) tensor, every contraction is one K=L (or K=NP) batched
        # MXU dot, and the dropout mask is evaluated once and reused.
        dp1 = dp_ref[pl.program_id(0), 0]
        da = dp1 * dx2r
        if with_drop:
            da = da * _keep2(da.shape, drop_rate, seed, _DRAW_PROJ, row0,
                             mode)
        do2 = _dot_nt(da, wp[:])
        do3 = do2.reshape(Wc, NP, C)

        # ---- packed attention recompute + backward ---------------------------
        masks = _head_masks(C, H)
        q3s = q3 * scale
        G = _seg_matrix(NP, H)
        K_pack = _pack_kv(k3, H)                           # (Wc, C, L)
        V_pack = _pack_kv(v3, H)
        S = _packed_scores(q3s, K_pack, bias_ref, mask_ref, H)
        p = _packed_softmax(S, G, Wc, NP, L)
        if training and attn_rate > 0.0:
            keep = _keep3((Wc, NP, L), attn_rate, seed, 3, wkey0, mode)
            pd = p * keep
        else:
            keep = None
            pd = p
        o2 = _bdot(pd, V_pack, 2, 2).reshape(R, C)

        dpd = _bdot(do3, V_pack, 2, 1)                     # (Wc, NP, L)
        dvf = _bdot(pd, do3, 1, 1)                         # (Wc, L, C)
        dv3 = _unstack_heads(dvf, masks, NP)
        dp_ = dpd * keep if keep is not None else dpd
        t = (dp_ * p).reshape(R, L)
        seg = _dot_nt(_dot(t, G), G).reshape(Wc, NP, L)    # per-head sums
        ds = p * (dp_ - seg)
        dbias_ref[:] += jnp.sum(ds, axis=0)                # (NP, L)
        dq3 = _bdot(ds, K_pack, 2, 2) * scale              # (Wc, NP, C)
        dkf = _bdot(ds, q3s, 1, 1)                         # (Wc, L, C)
        dk3 = _unstack_heads(dkf, masks, NP)

        # ---- proj param grads (need the full recomputed o) -------------------
        dbp_ref[:] += jnp.sum(da, axis=0, keepdims=True)
        dwp_ref[:] += _dot_tn(o2, da)

        if cross:
            dq = dq3.reshape(R, C)
            dkv = jnp.concatenate([dk3, dv3], axis=2).reshape(R, 2 * C)
            dbq_ref[:] += jnp.sum(dq, axis=0, keepdims=True)
            dwq_ref[:] += _dot_tn(h1, dq)
            dh1 = _dot_nt(dq, wq[:])
            dbkv_ref[:] += jnp.sum(dkv, axis=0, keepdims=True)
            dwkv_ref[:] += _dot_tn(h1y, dkv)
            dh1y = _dot_nt(dkv, wkv[:])
            dg1y_ref[:] += jnp.sum(dh1y * xh1y, axis=0, keepdims=True)
            db1y_ref[:] += jnp.sum(dh1y, axis=0, keepdims=True)
            dy = _ln_bwd(dh1y, xh1y, r1y, g1y[:])
            dy_ref[0] = dy.reshape(Wc, NP, C).astype(dy_ref.dtype)
        else:
            dqkv = jnp.concatenate([dq3, dk3, dv3], axis=2).reshape(R, 3 * C)
            dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
            dwqkv_ref[:] += _dot_tn(h1, dqkv)
            dh1 = _dot_nt(dqkv, wqkv[:])
        dg1_ref[:] += jnp.sum(dh1 * xh1, axis=0, keepdims=True)
        db1_ref[:] += jnp.sum(dh1, axis=0, keepdims=True)
        dx = dx2r + _ln_bwd(dh1, xh1, r1, g1[:])
        dx_ref[0] = dx.reshape(Wc, NP, C).astype(dx_ref.dtype)
    return kernel


def _resident(shape):
    return pl.BlockSpec(shape, lambda b, c, *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _x_spec(Wc, NP, C):
    return pl.BlockSpec((1, Wc, NP, C), lambda b, c, *_: (b, c, 0, 0),
                        memory_space=pltpu.VMEM)


def _in_specs(Wc, NP, C, H, with_mask, p_shapes, cross):
    x_spec = _x_spec(Wc, NP, C)
    specs = [x_spec]
    if cross:
        specs.append(x_spec)
    specs += [pl.BlockSpec(memory_space=pltpu.SMEM),  # dp, full (B, 2)
              _resident((NP, H * NP))]                # head-packed bias
    if with_mask:
        specs.append(pl.BlockSpec((Wc, NP, H * NP),
                                  lambda b, c, *_: (c, 0, 0),
                                  memory_space=pltpu.VMEM))
    specs += [_resident(s) for s in p_shapes]
    return specs, x_spec


def _tiled_mask(mask, H):
    """(nW, NP, NP) additive shift mask -> (nW, NP, L): tiled across head
    blocks host/XLA-side (the mask is static, so this constant-folds; the
    in-kernel 6-piece lane concat it replaces was a measured hot spot)."""
    if mask is None:
        return None
    m = jnp.asarray(mask, jnp.float32)
    return jnp.concatenate([m] * H, axis=2)


# Per-kernel window-chunk budgets (bytes of the 20.5 KB/window proxy unit in
# pick_window_chunk). The hash-keyed dropout masks are chunk-invariant, so
# forward, MLP-backward, and attention-backward each pick the largest chunk
# their own live set allows — the grid shell cost scales 1/Wc (measured
# ~0.6 ms/block at the round-1 Wc=14).
_CHUNK_BUDGETS = {
    "fwd": 580 * 1024,          # fwd live set ~12 tiles/window
    "fwd_cross": 580 * 1024,
    # merged-head-loop backward (no p_scratch): self fits Wc=28; cross (two
    # extra stream blocks: y in, dy out) measured 17.07 MB at 28 in the full
    # model — 1.07 MB over the 16 MB scoped-vmem limit — so it ran at 14
    # under hash masks; prng mode collapses it onto fwd_cross (_chunk_for)
    "attn": 580 * 1024,
    "attn_cross": 320 * 1024,
}

# Experiment knobs: scale every chunk budget / raise the Mosaic VMEM cap.
# The 16 MB scoped-vmem default is a compiler flag, not the hardware size —
# chunk probes ran a 48+ MB live set fine on the v5e — so the head-packed
# kernels default to a 64 MB cap and keep the chunk sizes VPU-optimal.
_BUDGET_MULT = float(os.environ.get("FUSION_BUDGET_MULT", "1"))
_VMEM_LIMIT = int(os.environ.get("FUSION_VMEM_LIMIT", str(64 * 1024 * 1024)))
_ABLATE = os.environ.get("FUSION_ABLATE", "")   # perf bisection, fwd only


def _compiler_params():
    if _VMEM_LIMIT:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    return None


@functools.lru_cache(maxsize=None)
def _bias_onehot(ws: int, heads: int, NP: int, rel_key) -> tuple:
    """Static (NP*NP, T) one-hot placement matrix + (NP, L) pad plane for
    packed_bias_from_table (rel_key: hashable bytes of rel_idx)."""
    N = ws * ws
    L = heads * NP
    rel = np.frombuffer(rel_key, np.int64).reshape(N, N)
    T = rel.max() + 1
    n = np.arange(NP)[:, None]
    m = np.arange(NP)[None, :]
    valid = (n < N) & (m < N)
    idx = np.where(valid, rel[np.minimum(n, N - 1), np.minimum(m, N - 1)], T)
    oh = (idx[..., None] == np.arange(T)[None, None]).astype(np.float32)
    lcol = np.arange(L)[None, :] % NP
    colpad = np.where(lcol >= N, np.float32(_NEG_INF),
                      np.float32(0.0)) * np.ones((NP, 1), np.float32)
    return oh.reshape(NP * NP, T), colpad


def packed_bias_from_table(table, ws: int, heads: int, NP: int,
                           rel_idx: np.ndarray) -> jnp.ndarray:
    """(NP, L) head-packed relative-position bias with -1e9 pad columns, as
    ONE matmul against a static one-hot placement matrix.

    Replaces the combined_bias -> transpose -> reshape chain the model ran
    per block per step (swinfusion_module.py:133-142). Earlier revisions used
    a f32[726] -> f32[9600] gather here, but the step profile attributed
    ~5 ms/step to the ~60 gather/scatter-add pairs it left inside the block
    scans (ROADMAP round-3 attribution); as a dot against a constant
    (NP^2, T) one-hot both directions ride the MXU and fuse: bias gradient
    = OH^T @ dbias, no scatter. The placement/pad planes are trace-time
    numpy (lru-cached per geometry)."""
    N = ws * ws
    rel = np.ascontiguousarray(np.asarray(rel_idx).reshape(N, N), np.int64)
    oh, colpad = _bias_onehot(ws, heads, NP, rel.tobytes())
    b3 = jnp.dot(jnp.asarray(oh),
                 jnp.asarray(table, jnp.float32)).reshape(NP, NP, heads)
    return (jnp.transpose(b3, (0, 2, 1)).reshape(NP, heads * NP)
            + jnp.asarray(colpad))


def _chunk_for(nW: int, NP: int, kind: str, mode: str) -> int:
    # PRNG masks require the merged backward to run the forward's grid so
    # per-(cell, draw) reseeding regenerates identical masks: collapse each
    # kind pair onto the forward's budget. (The old 320K attn_cross budget
    # only existed for the 16 MB scoped-vmem era; the 64 MB cap fits Wc=28.)
    if mode == "prng":
        kind = {"attn": "fwd", "attn_cross": "fwd_cross"}.get(kind, kind)
    return pick_window_chunk(nW, NP,
                             budget=int(_CHUNK_BUDGETS[kind] * _BUDGET_MULT))


def _fwd_impl(x, y, params, bias, mask, dp, seed, rates, training,
              interpret, cross):
    """Forward kernel; returns (out, x2r) — x2r feeds the split backward."""
    B, nW, NP, C = x.shape
    H = bias.shape[1] // NP          # bias arrives head-packed (NP, L)
    Ch = params[-4].shape[1]
    mode = _mode_for(interpret)
    Wc = _chunk_for(nW, NP, "fwd_cross" if cross else "fwd", mode)
    with_mask = mask is not None
    dims = (Wc, NP, C, H, Ch)
    p_shapes = param_shapes(C, Ch, cross)
    in_specs, x_spec = _in_specs(Wc, NP, C, H, with_mask, p_shapes, cross)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    # streams ride in the model's compute dtype (bf16 under the flagship
    # mixed-precision policy): halves stream DMA, inter-block layout-glue
    # traffic, and saved-residual HBM; kernels still compute in f32
    args = ((seed_arr, x) + ((jnp.asarray(y, x.dtype),) if cross else ())
            + (f32(dp), f32(bias))
            + ((_tiled_mask(mask, H),) if with_mask else ())
            + tuple(f32(p) for p in params))
    out, x2r = pl.pallas_call(
        _make_fwd_kernel(dims, rates, training, with_mask, cross, mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, nW // Wc),
            in_specs=in_specs, out_specs=[x_spec, x_spec]),
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)] * 2,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*args)
    return out, x2r


def _bwd_impl(x, y, params, bias, mask, dp, seed_arr, x2r, g, rates,
              training, interpret, cross):
    """Single merged backward kernel (MLP side then attention side, dx2r
    in-VMEM). Returns grads in the forward's param order."""
    B, nW, NP, C = x.shape
    H = bias.shape[1] // NP          # bias arrives head-packed (NP, L)
    Ch = params[-4].shape[1]
    with_mask = mask is not None
    p_shapes = param_shapes(C, Ch, cross)
    f32 = lambda t: jnp.asarray(t, jnp.float32)

    mode = _mode_for(interpret)
    Wc = _chunk_for(nW, NP, "attn_cross" if cross else "attn", mode)
    dims = (Wc, NP, C, H, Ch)
    x_spec = _x_spec(Wc, NP, C)
    in_specs = [x_spec]
    if cross:
        in_specs.append(x_spec)
    in_specs += [x_spec, x_spec,                      # x2r, g
                 pl.BlockSpec(memory_space=pltpu.SMEM),
                 _resident((NP, H * NP))]             # head-packed bias
    if with_mask:
        in_specs.append(pl.BlockSpec((Wc, NP, H * NP),
                                     lambda b, c, *_: (c, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs += [_resident(s) for s in p_shapes]
    out_specs = ([x_spec] + ([x_spec] if cross else [])
                 + [_resident((NP, H * NP))]
                 + [_resident(s) for s in p_shapes])
    out_shapes = ([jax.ShapeDtypeStruct(x.shape, x.dtype)]
                  * (2 if cross else 1)
                  + [jax.ShapeDtypeStruct((NP, H * NP), jnp.float32)]
                  + [jax.ShapeDtypeStruct(s, jnp.float32)
                     for s in p_shapes])
    args = ((seed_arr, x) + ((jnp.asarray(y, x.dtype),) if cross else ())
            + (x2r, jnp.asarray(g, x.dtype), f32(dp), f32(bias))
            + ((_tiled_mask(mask, H),) if with_mask else ())
            + tuple(f32(p) for p in params))
    outs = pl.pallas_call(
        _make_bwd_kernel(dims, rates, training, with_mask, cross, mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, nW // Wc),
            in_specs=in_specs, out_specs=out_specs),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(*args)
    if cross:
        dx, dy, dbias = outs[0], outs[1], outs[2]
        d_params = outs[3:]
    else:
        dx, dbias = outs[0], outs[1]
        dy = None
        d_params = outs[2:]
    dparams = tuple(d.astype(jnp.asarray(p).dtype)
                    for d, p in zip(d_params, params))
    return dx, dy, dparams, dbias


# ---------------------------------------------------------------------------
# custom-VJP entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_fusion_block(x, params, bias, mask, dp, seed,
                       rates: Tuple[float, float], training: bool,
                       interpret: bool = False):
    """One full pre-norm SwinFusion self-attention block as a single TPU
    kernel.

    x: (B, nW, NP, C) padded window tokens. params: 12-tuple of 2-D weights
    (module docstring). bias: (H, NP, NP) relative position bias with the
    -1e9 pad-column mask folded in. mask: optional (nW, NP, NP) additive
    shift mask. dp: (B, 2) per-sample DropPath scales (1/keep or 0). seed:
    scalar int32 for the in-kernel dropout PRNG. rates: (attn_drop, drop).
    """
    return _ffb_fwd(x, params, bias, mask, dp, seed, rates, training,
                    interpret)[0]


def _ffb_fwd(x, params, bias, mask, dp, seed, rates, training, interpret):
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    out, x2r = _fwd_impl(x, None, params, bias, mask, dp, seed_arr, rates,
                         training, interpret, cross=False)
    return out, (x, params, bias, mask, dp, seed_arr, x2r)


def _ffb_bwd(rates, training, interpret, res, g):
    x, params, bias, mask, dp, seed_arr, x2r = res
    dx, _, dparams, dbias = _bwd_impl(x, None, params, bias, mask, dp,
                                      seed_arr, x2r, g, rates, training,
                                      interpret, cross=False)
    return (dx.astype(x.dtype), dparams, dbias.astype(bias.dtype),
            None, None, None)


fused_fusion_block.defvjp(_ffb_fwd, _ffb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_cross_fusion_block(x, y, params, bias, mask, dp, seed,
                             rates: Tuple[float, float], training: bool,
                             interpret: bool = False):
    """One directed cross-attention half-block (q from x, k/v from y) as a
    single TPU kernel; the bidirectional CrossFusionBlock calls it twice.
    params: 16-tuple (module docstring). Returns the updated x stream."""
    return _fcb_fwd(x, y, params, bias, mask, dp, seed, rates, training,
                    interpret)[0]


def _fcb_fwd(x, y, params, bias, mask, dp, seed, rates, training, interpret):
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    out, x2r = _fwd_impl(x, y, params, bias, mask, dp, seed_arr, rates,
                         training, interpret, cross=True)
    return out, (x, y, params, bias, mask, dp, seed_arr, x2r)


def _fcb_bwd(rates, training, interpret, res, g):
    x, y, params, bias, mask, dp, seed_arr, x2r = res
    dx, dy, dparams, dbias = _bwd_impl(x, y, params, bias, mask, dp,
                                       seed_arr, x2r, g, rates, training,
                                       interpret, cross=True)
    return (dx.astype(x.dtype), dy.astype(y.dtype), dparams,
            dbias.astype(bias.dtype), None, None, None)


fused_cross_fusion_block.defvjp(_fcb_fwd, _fcb_bwd)


# ---------------------------------------------------------------------------
# Pure-jnp references over the SAME params/layout (parity tests + as
# documentation of the exact math the kernels implement).
# ---------------------------------------------------------------------------

def _split_heads(t, H):
    B, nW, NP, C = t.shape
    return t.reshape(B, nW, NP, H, C // H).transpose(0, 1, 3, 2, 4)


def _merge_heads(t):
    B, nW, H, NP, hd = t.shape
    return t.transpose(0, 1, 3, 2, 4).reshape(B, nW, NP, H * hd)


def _attn_reference(q, k, v, bias, mask, H):
    hd = q.shape[-1] // H
    qh = _split_heads(q, H) * (hd ** -0.5)
    kh, vh = _split_heads(k, H), _split_heads(v, H)
    s = jnp.einsum("bwhnd,bwhmd->bwhnm", qh, kh) + bias[None, None]
    if mask is not None:
        s = s + jnp.asarray(mask, jnp.float32)[None, :, None]
    p = jax.nn.softmax(s, axis=-1)
    return _merge_heads(jnp.einsum("bwhnm,bwhmd->bwhnd", p, vh))


def _tail_reference(xf, o, wp, bp, g2, b2, w1, b1m, w2, b2m, dp):
    a = jnp.einsum("bwnc,cd->bwnd", o, wp) + bp[0]
    x2r = xf + dp[:, 0][:, None, None, None] * a
    h2, _, _ = _ln_fwd(x2r, g2, b2)
    u = jnp.einsum("bwnc,cd->bwnd", h2, w1) + b1m[0]
    z = jnp.einsum("bwnc,cd->bwnd", _gelu(u), w2) + b2m[0]
    return x2r + dp[:, 1][:, None, None, None] * z


def fusion_block_reference(x, params, bias, mask, dp,
                           rates=(0.0, 0.0), training=False):
    """Differentiable jnp twin of fused_fusion_block (dropout unsupported —
    rates must be 0; stochastic parity across PRNG styles is meaningless)."""
    assert rates == (0.0, 0.0) or not training
    (g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, b1m, w2, b2m) = [
        jnp.asarray(p, jnp.float32) for p in params]
    H = bias.shape[0]
    xf = jnp.asarray(x, jnp.float32)
    h1, _, _ = _ln_fwd(xf, g1, b1)
    qkv = jnp.einsum("bwnc,cd->bwnd", h1, wqkv) + bqkv[0]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = _attn_reference(q, k, v, bias, mask, H)
    return _tail_reference(xf, o, wp, bp, g2, b2, w1, b1m, w2, b2m,
                           dp).astype(x.dtype)


def cross_fusion_block_reference(x, y, params, bias, mask, dp,
                                 rates=(0.0, 0.0), training=False):
    """Differentiable jnp twin of fused_cross_fusion_block."""
    assert rates == (0.0, 0.0) or not training
    (g1, b1, g1y, b1y, wq, bq, wkv, bkv,
     wp, bp, g2, b2, w1, b1m, w2, b2m) = [
        jnp.asarray(p, jnp.float32) for p in params]
    H = bias.shape[0]
    xf = jnp.asarray(x, jnp.float32)
    yf = jnp.asarray(y, jnp.float32)
    h1, _, _ = _ln_fwd(xf, g1, b1)
    h1y, _, _ = _ln_fwd(yf, g1y, b1y)
    q = jnp.einsum("bwnc,cd->bwnd", h1, wq) + bq[0]
    kv = jnp.einsum("bwnc,cd->bwnd", h1y, wkv) + bkv[0]
    k, v = jnp.split(kv, 2, axis=-1)
    o = _attn_reference(q, k, v, bias, mask, H)
    return _tail_reference(xf, o, wp, bp, g2, b2, w1, b1m, w2, b2m,
                           dp).astype(x.dtype)


def combined_bias(table, ws: int, heads: int, NP: int,
                  rel_index: np.ndarray) -> jnp.ndarray:
    """(H, NP, NP) relative-position bias with -1e9 on pad key columns.

    Differentiable in ``table`` — the gather's transpose (scatter-add back
    into the (2ws-1)^2 table) is left to XLA outside the kernel."""
    N = ws * ws
    idx = jnp.asarray(rel_index.reshape(-1))
    b = table[idx].reshape(N, N, heads).transpose(2, 0, 1)
    b = jnp.pad(b, ((0, 0), (0, NP - N), (0, NP - N)))
    colpad = np.zeros((1, NP, NP), np.float32)
    colpad[:, :, N:] = _NEG_INF
    return b + jnp.asarray(colpad)
