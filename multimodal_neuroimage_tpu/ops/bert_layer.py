"""Pallas fused BERT layer (TPU megakernel).

The temporal-BERT stacks (reference model.py:154-192 feeding HF BertModel;
ours nn/bert.py) run 2 x 16 post-LN layers at T=369 tokens, hidden 84. Each
layer is ~15 small XLA kernels; on the tunneled v5e the step is
dispatch-bound, so the full HF BertLayer —

    q/k/v proj -> per-head softmax(q k^T/sqrt(hd) + keypad) (+attn dropout)
    -> context -> output dense (+dropout) -> LN(x + out)          [post-LN]
    -> intermediate dense -> erf-GELU -> output dense (+dropout)
    -> LN(x + out)

— is fused into ONE Pallas kernel per direction, exactly reproducing the
HF semantics nn/bert.py is parity-tested against (erf GELU, LN eps 1e-12,
exact two-pass variance).

Layout: (B, TP, H) with TP = round_up(T, 8); the encoder pads ONCE before
the scanned stack and slices after. Pad keys get -1e9 scores in-kernel (no
mask input needed — static T); pad-row values are garbage that never reaches
real rows and receives zero cotangent.

The FFN (H -> 3072 -> H) is computed in column chunks so the (TP, 3072)
intermediate never materializes; the backward recomputes each chunk
(flash-style) and accumulates dW1/dW2 per chunk. Dropout uses the same
per-draw PRNG scheme as ops/fusion_block.py.
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

from multimodal_neuroimage_tpu.ops.fusion_block import (  # shared helpers
    _dot, _dot_nt, _dot_tn, _keep_scale, _ln_bwd, _seed_draw, round_up)
from multimodal_neuroimage_tpu.ops import fusion_block as _fb


def _drop(shape, rate, seed_ref, draw, mode, row0):
    """Per-(grid-cell, draw) dropout keep/scale mask. mode "prng": hardware
    PRNG reseeded per (grid cell, draw). mode "hash" (interpreted runs —
    fusion_block._mode_for semantics: the HLO interpreter has no prng_seed
    and Mosaic interpret stubs prng_random_bits to zeros): coordinate-hash
    masks keyed by (seed, draw, global row, col). ``row0`` is the mask's
    global starting row (grid cell offset + in-cell subject offset), so
    masks stay independent across samples in BOTH grid layouts."""
    if mode == "prng":
        _seed_draw(seed_ref, draw)
        return _keep_scale(shape, rate)
    return _fb._hash_keep2(shape, rate, seed_ref[0], draw, row0)

_LN_EPS = 1e-12
_NEG_INF = -1e9
N_PARAMS = 16
# params order (2-D f32):
#   wq (H,H), bq (1,H), wk, bk, wv, bv, wo, bo, g1 (1,H), b1 (1,H),
#   w1 (H,F), b1m (1,F), w2 (F,H), b2m (1,H), g2 (1,H), b2 (1,H)

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


def _gelu_erf(u):
    return 0.5 * u * (1.0 + _erf(u * _INV_SQRT2))


def _gelu_erf_grad(u):
    return (0.5 * (1.0 + _erf(u * _INV_SQRT2))
            + u * jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI)


def _ln_fwd(x, g, b):
    """fusion_block's exact two-pass LN at HF's eps (1e-12)."""
    return _fb._ln_fwd(x, g, b, eps=_LN_EPS)


def param_shapes(H: int, F: int):
    return [(H, H), (1, H)] * 4 + [(1, H), (1, H), (H, F), (1, F),
                                   (F, H), (1, H), (1, H), (1, H)]


def _mm(mm16: bool):
    """Stream-projection matmul trio: bf16 operands / f32 accumulation when
    the surrounding model runs bf16 (f32 matmuls run at ~1/4 the MXU rate on
    v5e — the FFN dots are ~3/4 of a BERT layer's FLOPs). The fp32 path keeps
    exact HF parity (tests/test_bert_parity.py)."""
    if not mm16:
        return _dot, _dot_nt, _dot_tn
    c = lambda t: t.astype(jnp.bfloat16)
    return (lambda a, b: _dot(c(a), c(b)),
            lambda a, b: _dot_nt(c(a), c(b)),
            lambda a, b: _dot_tn(c(a), c(b)))


def _ffn_chunk(F: int, cap: int = 768) -> int:
    best = F
    for c in (768, 512, 1024, 384, 256, 128):
        if F % c == 0 and c <= cap:
            return c
    return best


def _keypad(TP: int, T: int):
    """(1, TP) pad-key mask row — constant across query rows, so it
    broadcast-adds into the (TP, TP) scores. Materializing the full
    (TP, *) iota/mod/where tensor instead measured 0.122 ms/layer at
    B=64 (8% of the training forward — scripts/bert_ablate_ladder.sh)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TP), 1)
    return jnp.where(col >= T, _NEG_INF, 0.0)


# Attention plan (env BERT_ATTN):
#   "packed" (default) — all heads' score matrices ride one (TP, heads*TP)
#     lane axis: ONE K-pack dot, ONE logit-cap softmax, ONE dropout draw,
#     ONE context dot. At heads=12/hd=7 the per-head loop runs 24 tiny
#     K=7/N=7 dots per direction (~5% MXU utilization) plus 12 cross-lane
#     max-reduces; packing replaces them with K=84/K=heads*TP dots. Same
#     packing scheme as ops/fusion_block.py (which measured ~6x from it).
#   "loop" — the original per-head loop, kept for A/B and as the
#     max-subtracted-softmax oracle.
# ops/autoplan.resolve_plans() may flip this to "loop" on TPU if the packed
# canary fails to compile; an explicit BERT_ATTN env pins it.
_ATTN_PINNED = "BERT_ATTN" in os.environ
_ATTN_MODE = os.environ.get("BERT_ATTN", "packed")

# Grid plan (env BERT_GRID): "subject" — one subject per grid cell (the
# original layout); "batched" — Bc subjects folded into the row axis per
# cell (see the batched-kernel block below). BERT_BC caps Bc (VMEM).
# ops/autoplan + bench.py race/cache the winner like the other plans.
_GRID_PINNED = "BERT_GRID" in os.environ
_GRID_MODE = os.environ.get("BERT_GRID", "subject")
_BC_CAP = int(os.environ.get("BERT_BC", "8"))

# The batched kernels' merged backward holds ~17 folded row buffers + the
# per-subject attention recompute live at once — past the shared 64 MB cap
# at Bc=8 (measured: Mosaic scoped-allocation failure on v5e). v5e VMEM is
# 128 MB; give the batched kernels their own higher ceiling and let
# autoplan/bench shrink Bc (8 -> 4 -> 2) if the hardware still refuses.
# (Bc=4 measured 101.05 MB inside the full flagship step on v5e, hence 112.)
_BATCHED_VMEM = int(os.environ.get("BERT_BATCHED_VMEM",
                                   str(112 * 1024 * 1024)))

# Mosaic's scoped-vmem request for the SAME kernel is 1-2 MB larger inside a
# big program than in a standalone canary jit (surrounding layouts/bitcasts
# add relayout windows — measured: canary passed at 100 MB while the full
# step's twin requested 101.05 MB and failed). autoplan sets this margin
# while its canaries compile so canary-pass implies full-step-pass.
_VMEM_MARGIN = 0


def _batched_compiler_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=_BATCHED_VMEM - _VMEM_MARGIN)


def shrink_bc() -> bool:
    """Halve the batched grid's per-cell subject cap (canary/race fallback
    chain). Returns False when no smaller batched plan remains."""
    global _BC_CAP
    if _BC_CAP <= 2:
        return False
    _BC_CAP //= 2
    return True


def _bc_for(B: int) -> int:
    """Subjects per grid cell under the batched plan: the largest divisor
    of B within the VMEM cap (B=8 -> 8, B=12 -> 6, prime B -> 1)."""
    bc = min(B, max(_BC_CAP, 1))
    while B % bc:
        bc -= 1
    return bc


def _keypad_packed(TP: int, T: int, heads: int):
    """(1, heads*TP) packed pad-key mask row: lane l covers key t = l % TP.
    One row broadcast into the (TP, L) scores — see _keypad."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, heads * TP), 1) % TP
    return jnp.where(col >= T, _NEG_INF, 0.0)


def _pack_heads(t, heads):
    """(TP, H) -> head-packed (H, heads*TP): K_pack[c, h*TP+t] = t[t, c] if
    channel c belongs to head h else 0. TP is 128-aligned here so the tile
    is a lane-aligned copy (no placement matmul needed, unlike NP=56 in
    fusion_block._pack_kv)."""
    TP, H = t.shape
    hd = H // heads
    L = heads * TP
    tiled = jnp.tile(jnp.swapaxes(t, 0, 1), (1, heads))      # (H, L)
    sub_c = jax.lax.broadcasted_iota(jnp.int32, (H, L), 0)
    sel = (sub_c // hd
           == jax.lax.broadcasted_iota(jnp.int32, (H, L), 1) // TP)
    return tiled * sel.astype(jnp.float32)


def _seg_softmax(S, G, mm16: bool = False):
    """Per-head-segment logit-cap softmax over the packed lane axis.
    S (TP, L), G (L, heads) segment indicator.

    The cap (fusion_block._LOGIT_CAP = 80) replaces per-head max
    subtraction; identical below the cap, and at hd=7 / LN-bounded inputs
    trained logits stay orders of magnitude under 80. If a score DID exceed
    80 the clamp would zero its gradient — BERT_ATTN=loop keeps the
    max-subtracted oracle for checking that (tests compare the two).

    ``mm16``: bf16 operands / f32 accumulation for the two segment dots —
    at heads=12 the (TP, L) x (L, 12) sum dot is lane-pad-dominated and f32
    MXU passes cost several x bf16; the ~2^-8 denominator wobble is below
    the bf16 rounding the context dot applies to p anyway (see
    fusion_block._packed_softmax)."""
    e = jnp.exp(jnp.minimum(S, _fb._LOGIT_CAP))
    if mm16:
        Gb = G.astype(jnp.bfloat16)
        den = _dot(e.astype(jnp.bfloat16), Gb)     # (TP, heads), f32 acc
        return e * _dot_nt((1.0 / jnp.maximum(den, 1e-38)
                            ).astype(jnp.bfloat16), Gb)
    den = _dot(e, G)                               # (TP, heads)
    return e * _dot_nt(1.0 / jnp.maximum(den, 1e-38), G)


def _unpack_rows(full, TP, heads, hd):
    """(L, H) -> (TP, H): keep each head's own row block per channel."""
    H = heads * hd
    ch = jax.lax.broadcasted_iota(jnp.int32, (TP, H), 1) // hd
    acc = full[0:TP, :] * (ch == 0).astype(jnp.float32)
    for h in range(1, heads):
        acc = acc + (full[h * TP:(h + 1) * TP, :]
                     * (ch == h).astype(jnp.float32))
    return acc


def _attn_packed_fwd(q, k, v, dims, scale, attn_rate, seed_ref, training,
                     mm16, mode, draw: int = 3, row0=None):
    """Head-packed attention forward: returns (ctx, p, pd, K_pack, V_pack).
    ``draw``/``row0`` key this subject's dropout mask (batched grid packs
    several subjects into one cell — each needs its own draw)."""
    TP, H, F, heads, T = dims
    mdot, mdot_nt, _ = _mm(mm16)
    K_pack = _pack_heads(k, heads)                 # (H, L)
    V_pack = _pack_heads(v, heads)
    S = mdot(q * scale, K_pack) + _keypad_packed(TP, T, heads)
    p = _seg_softmax(S, _fb._seg_matrix(TP, heads), mm16)
    if training and attn_rate > 0.0:
        r0 = pl.program_id(0) * TP if row0 is None else row0
        pd = p * _drop(p.shape, attn_rate, seed_ref, draw, mode, r0)
    else:
        pd = p
    ctx = mdot_nt(pd, V_pack)                      # (TP, H)
    return ctx, p, pd, K_pack, V_pack


def _attn_head(q, k, v, h, heads, hd, scale, keypad, attn_rate, seed_ref,
               training, mode, TP, draw_base: int = 3, row0=None):
    qh = q[:, h * hd:(h + 1) * hd] * scale
    kh = k[:, h * hd:(h + 1) * hd]
    vh = v[:, h * hd:(h + 1) * hd]
    s = _dot_nt(qh, kh) + keypad                  # (TP, TP)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if training and attn_rate > 0.0:
        r0 = pl.program_id(0) * TP if row0 is None else row0
        pd = p * _drop(p.shape, attn_rate, seed_ref, draw_base + h, mode, r0)
    else:
        pd = p
    return qh, kh, vh, p, pd, _dot(pd, vh)        # ctx_h (TP, hd)


def _fwd_parts(seed_ref, x_ref, prefs, dims, rates, training, ctx_scratch,
               mm16=False, mode="prng"):
    """Shared forward: returns (out, residual values)."""
    TP, H, F, heads, T = dims
    attn_rate, drop_rate = rates
    hd = H // heads
    scale = hd ** -0.5
    mdot, mdot_nt, mdot_tn = _mm(mm16)
    (wq, bq, wk, bk, wv, bv, wo, bo, g1, b1,
     w1, b1m, w2, b2m, g2, b2) = prefs

    x = x_ref[0].astype(jnp.float32)              # (TP, H)
    if _ABLATE == "copy":                          # shell + DMA floor
        ones = jnp.ones((TP, 1), jnp.float32)
        return x, (x, x, x, x, x, None, x, x, ones, None, x, ones, x)
    q = mdot(x, wq[:]) + bq[:]
    k = mdot(x, wk[:]) + bk[:]
    v = mdot(x, wv[:]) + bv[:]
    if _ABLATE == "noattn":                        # skip attention
        ctx = q
    elif _ABLATE in ("dotsonly", "nosm"):          # packs + dots (+keypad)
        mdot_, mdot_nt_, _ = _mm(mm16)
        K_pack = _pack_heads(k, heads)
        V_pack = _pack_heads(v, heads)
        S = mdot_(q * scale, K_pack)
        if _ABLATE == "nosm":
            S = S + _keypad_packed(TP, T, heads)
        ctx = mdot_nt_(S * 0.01, V_pack)
    elif _ATTN_MODE == "packed":
        ctx, *_ = _attn_packed_fwd(q, k, v, dims, scale, attn_rate,
                                   seed_ref, training, mm16, mode)
    else:
        keypad = _keypad(TP, T)
        for h in range(heads):
            *_, ctx_h = _attn_head(q, k, v, h, heads, hd, scale, keypad,
                                   attn_rate, seed_ref, training, mode, TP)
            ctx_scratch[:, h * hd:(h + 1) * hd] = ctx_h
        ctx = ctx_scratch[:]
    a = mdot(ctx, wo[:]) + bo[:]
    row0 = pl.program_id(0) * TP
    if training and drop_rate > 0.0:
        m0 = _drop(a.shape, drop_rate, seed_ref, 0, mode, row0)
        a = a * m0
    else:
        m0 = None
    x1, xh1, r1 = _ln_fwd(a + x, g1[:], b1[:])

    Fc = _ffn_chunk(F)
    z = jnp.zeros((TP, H), jnp.float32) + b2m[:]
    if _ABLATE != "noffn":
        for c0 in range(0, F, Fc):
            u_c = mdot(x1, w1[:, c0:c0 + Fc]) + b1m[:, c0:c0 + Fc]
            z = z + mdot(_gelu_erf(u_c), w2[c0:c0 + Fc, :])
    if training and drop_rate > 0.0:
        m1 = _drop(z.shape, drop_rate, seed_ref, 1, mode, row0)
        z = z * m1
    else:
        m1 = None
    a2 = z + x1                                   # pre-LN2 sum (residual)
    out, xh2, r2 = _ln_fwd(a2, g2[:], b2[:])
    return out, (x, q, k, v, ctx, m0, x1, xh1, r1, m1, xh2, r2, a2)


def _make_fwd_kernel(dims, rates, training, mm16=False, mode="prng",
                     save_resid=True):
    """``save_resid=False`` builds the 2-output variant (out, x1): Pallas
    outputs are never DCE'd, so inference and BERT_BWD_RESID=0 must not pay
    the two extra (B, TP, H) f32 HBM writes per layer (round-4 advisor)."""
    def kernel(seed_ref, x_ref, *rest):
        prefs = rest[0:N_PARAMS]
        if save_resid:
            (o_ref, x1_ref, ctx_ref, a2_ref,
             ctx_scratch) = rest[N_PARAMS:N_PARAMS + 5]
        else:
            o_ref, x1_ref, ctx_scratch = rest[N_PARAMS:N_PARAMS + 3]
        out, res = _fwd_parts(seed_ref, x_ref, prefs, dims, rates, training,
                              ctx_scratch, mm16, mode)
        o_ref[0] = out.astype(o_ref.dtype)
        x1_ref[0] = res[6].astype(x1_ref.dtype)   # x1 (post-attention LN)
        if save_resid:
            ctx_ref[0] = res[4]                   # f32 residuals: the bwd
            a2_ref[0] = res[12]                   # skips both recomputes
    return kernel


# ---------------------------------------------------------------------------
# Batched grid (env BERT_GRID=batched): Bc subjects per grid cell.
#
# The per-subject grid runs every dot at M=TP=376 rows — the projections and
# the FFN (>=90% of a layer's FLOPs) never feed the MXU more than 376x84
# operands, and the dW accumulations serialize across B grid cells through
# the output refs. Folding Bc subjects into the ROW axis runs those dots at
# M=Bc*TP (3008 at Bc=8) and turns the dW accumulation into ONE contraction
# over the folded rows; only the score/softmax/context block stays
# per-subject (its (TP, heads*TP) geometry is position-dependent). The
# profile that motivated this: 23.6 ms/step across 64 layer calls at 7% MFU
# (see ROADMAP round-3 notes).
# ---------------------------------------------------------------------------

def _attn_fwd_into(seed_ref, q, k, v, ctx_scratch, b, dims, rates, training,
                   mm16, mode, cell_row0):
    """One subject's attention (rows b*TP..): ctx written into the scratch.
    Draws are per-subject (3+b packed / 3+b*heads+h loop) so masks stay
    independent within a batched cell; at Bc=1 they reduce to the original
    per-subject draws."""
    TP, H, F, heads, T = dims
    attn_rate, _ = rates
    hd = H // heads
    scale = hd ** -0.5
    sl = slice(b * TP, (b + 1) * TP)
    row0 = cell_row0 + b * TP
    if _ATTN_MODE == "packed":
        ctx_b, *_ = _attn_packed_fwd(q[sl], k[sl], v[sl], dims, scale,
                                     attn_rate, seed_ref, training, mm16,
                                     mode, draw=3 + b, row0=row0)
        ctx_scratch[sl] = ctx_b
    else:
        keypad = _keypad(TP, T)
        for h in range(heads):
            *_, ctx_h = _attn_head(q[sl], k[sl], v[sl], h, heads, hd, scale,
                                   keypad, attn_rate, seed_ref, training,
                                   mode, TP, draw_base=3 + b * heads,
                                   row0=row0)
            ctx_scratch[sl, h * hd:(h + 1) * hd] = ctx_h


def _make_fwd_kernel_batched(dims, rates, training, mm16, mode, Bc,
                             save_resid=True):
    def kernel(seed_ref, x_ref, *rest):
        prefs = rest[0:N_PARAMS]
        if save_resid:
            (o_ref, x1_ref, ctx_ref, a2_ref,
             ctx_scratch) = rest[N_PARAMS:N_PARAMS + 5]
        else:
            o_ref, x1_ref, ctx_scratch = rest[N_PARAMS:N_PARAMS + 3]
        TP, H, F, heads, T = dims
        attn_rate, drop_rate = rates
        R = Bc * TP
        mdot, mdot_nt, mdot_tn = _mm(mm16)
        (wq, bq, wk, bk, wv, bv, wo, bo, g1, b1,
         w1, b1m, w2, b2m, g2, b2) = prefs
        x = x_ref[...].reshape(R, H).astype(jnp.float32)
        q = mdot(x, wq[:]) + bq[:]
        k = mdot(x, wk[:]) + bk[:]
        v = mdot(x, wv[:]) + bv[:]
        cell_row0 = pl.program_id(0) * R
        for b in range(Bc):
            _attn_fwd_into(seed_ref, q, k, v, ctx_scratch, b, dims, rates,
                           training, mm16, mode, cell_row0)
        ctx = ctx_scratch[:]
        a = mdot(ctx, wo[:]) + bo[:]
        if training and drop_rate > 0.0:
            a = a * _drop(a.shape, drop_rate, seed_ref, 0, mode, cell_row0)
        x1, _, _ = _ln_fwd(a + x, g1[:], b1[:])
        Fc = _ffn_chunk(F)
        z = jnp.zeros((R, H), jnp.float32) + b2m[:]
        for c0 in range(0, F, Fc):
            u_c = mdot(x1, w1[:, c0:c0 + Fc]) + b1m[:, c0:c0 + Fc]
            z = z + mdot(_gelu_erf(u_c), w2[c0:c0 + Fc, :])
        if training and drop_rate > 0.0:
            z = z * _drop(z.shape, drop_rate, seed_ref, 1, mode, cell_row0)
        a2 = z + x1                               # pre-LN2 sum (residual)
        out, _, _ = _ln_fwd(a2, g2[:], b2[:])
        o_ref[...] = out.reshape(Bc, TP, H).astype(o_ref.dtype)
        x1_ref[...] = x1.reshape(Bc, TP, H).astype(x1_ref.dtype)
        if save_resid:
            ctx_ref[...] = ctx.reshape(Bc, TP, H)
            a2_ref[...] = a2.reshape(Bc, TP, H)
    return kernel


def _make_merged_bwd_kernel_batched(dims, rates, training, mm16, mode, Bc,
                                    use_resid=True):
    """Batched-grid merged backward: FFN/LN2 + projection/LN1 backward over
    the folded (Bc*TP, H) rows (single dots, single dW contractions); the
    score/softmax/context recompute + backward loops subjects. Masks
    regenerate identically to the batched forward (same grid, same draws,
    same row origins).

    With the forward-saved residuals (ctx, a2 — BERT_BWD_RESID, default on;
    ``use_resid`` mirrors whether the forward actually saved them) the
    kernel skips BOTH of its forward recomputes: the per-subject attention
    pass that only rebuilt ctx/LN1 statistics, and the chunked FFN forward
    that only rebuilt LN2 statistics — together ~1/3 of the backward's
    FLOPs. The saved ctx/a2 are bitwise the forward's values; the backward
    recompute path differs from them only by f32 summation-order noise
    (its 256-chunk FFN rebuild sums in a different order than the forward's
    larger chunks), so the two plans' gradients agree to ~1e-5 rtol, not
    bitwise (tests/test_bert_megakernel.py A/Bs them at rtol=5e-5)."""
    def kernel(seed_ref, x_ref, x1_ref, *more):
        if use_resid:
            ctx_ref, a2_ref, g_ref = more[0], more[1], more[2]
            rest = more[3:]
        else:
            ctx_ref = a2_ref = None
            g_ref = more[0]
            rest = more[1:]
        prefs = rest[0:N_PARAMS]
        (wq, bq, wk, bk, wv, bv, wo, bo, g1, b1,
         w1, b1m, w2, b2m, g2, b2) = prefs
        dx_ref = rest[N_PARAMS]
        dp_refs = rest[N_PARAMS + 1:2 * N_PARAMS + 1]
        (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref, dwo_ref,
         dbo_ref, dg1_ref, db1_ref, dw1_ref, db1m_ref, dw2_ref, db2m_ref,
         dg2_ref, db2_ref) = dp_refs
        ctx_scratch, dqkv_scratch = rest[2 * N_PARAMS + 1:]
        TP, H, F, heads, T = dims
        attn_rate, drop_rate = rates
        hd = H // heads
        scale = hd ** -0.5
        R = Bc * TP
        mdot, mdot_nt, mdot_tn = _mm(mm16)

        is_first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0))

        @pl.when(is_first)
        def _():
            for ref in dp_refs:
                ref[:] = jnp.zeros_like(ref)

        x = x_ref[...].reshape(R, H).astype(jnp.float32)
        x1 = x1_ref[...].reshape(R, H).astype(jnp.float32)
        g = g_ref[...].reshape(R, H).astype(jnp.float32)
        dx1 = _ffn_bwd_body(seed_ref, x1, g, w1, b1m, w2, b2m, g2, b2,
                            dw1_ref, db1m_ref, dw2_ref, db2m_ref, dg2_ref,
                            db2_ref, dims, rates, training, mm16, mode,
                            rows=R,
                            a2=(a2_ref[...].reshape(R, H) if use_resid
                                else None))

        q = mdot(x, wq[:]) + bq[:]
        k = mdot(x, wk[:]) + bk[:]
        v = mdot(x, wv[:]) + bv[:]
        cell_row0 = pl.program_id(0) * R
        if use_resid:
            ctx = ctx_ref[...].reshape(R, H)
        else:
            for b in range(Bc):                   # ctx recompute (pass 1)
                _attn_fwd_into(seed_ref, q, k, v, ctx_scratch, b, dims,
                               rates, training, mm16, mode, cell_row0)
            ctx = ctx_scratch[:]
        a = mdot(ctx, wo[:]) + bo[:]
        if training and drop_rate > 0.0:
            m0 = _drop(a.shape, drop_rate, seed_ref, 0, mode, cell_row0)
            a = a * m0
        else:
            m0 = None
        _, xh1, r1 = _ln_fwd(a + x, g1[:], b1[:])

        dg1_ref[:] += jnp.sum(dx1 * xh1, axis=0, keepdims=True)
        db1_ref[:] += jnp.sum(dx1, axis=0, keepdims=True)
        dy1 = _ln_bwd(dx1, xh1, r1, g1[:])
        da = dy1 * m0 if m0 is not None else dy1
        dbo_ref[:] += jnp.sum(da, axis=0, keepdims=True)
        dwo_ref[:] += mdot_tn(ctx, da)
        dctx = mdot_nt(da, wo[:])

        for b in range(Bc):                       # score backward (pass 2)
            sl = slice(b * TP, (b + 1) * TP)
            row0 = cell_row0 + b * TP
            if _ATTN_MODE == "packed":
                _, p, pd, K_pack, V_pack = _attn_packed_fwd(
                    q[sl], k[sl], v[sl], dims, scale, attn_rate, seed_ref,
                    training, mm16, mode, draw=3 + b, row0=row0)
                G = _fb._seg_matrix(TP, heads)
                dctx_b = dctx[b * TP:(b + 1) * TP]
                dpd = mdot(dctx_b, V_pack)
                dv_b = _unpack_rows(mdot_tn(pd, dctx_b), TP, heads, hd)
                if training and attn_rate > 0.0:
                    dp = dpd * _drop(dpd.shape, attn_rate, seed_ref, 3 + b,
                                     mode, row0)
                else:
                    dp = dpd
                seg_sum = _fb._seg_rows(dp * p, G, mm16)
                ds = p * (dp - seg_sum)
                dqkv_scratch[sl, 0:H] = mdot_nt(ds, K_pack) * scale
                dqkv_scratch[sl, H:2 * H] = _unpack_rows(
                    mdot_tn(ds, q[sl] * scale), TP, heads, hd)
                dqkv_scratch[sl, 2 * H:3 * H] = dv_b
            else:
                keypad = _keypad(TP, T)
                for h in range(heads):
                    qh, kh, vh, p, pd, _ = _attn_head(
                        q[sl], k[sl], v[sl], h, heads, hd, scale, keypad,
                        attn_rate, seed_ref, training, mode, TP,
                        draw_base=3 + b * heads, row0=row0)
                    dctx_h = dctx[b * TP:(b + 1) * TP, h * hd:(h + 1) * hd]
                    dpd = _dot_nt(dctx_h, vh)
                    dvh = _dot_tn(pd, dctx_h)
                    if training and attn_rate > 0.0:
                        dp = dpd * _drop(dpd.shape, attn_rate, seed_ref,
                                         3 + b * heads + h, mode, row0)
                    else:
                        dp = dpd
                    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                    dqkv_scratch[sl, h * hd:(h + 1) * hd] = _dot(ds, kh) * scale
                    dqkv_scratch[sl, H + h * hd:H + (h + 1) * hd] = \
                        _dot_tn(ds, qh)
                    dqkv_scratch[sl, 2 * H + h * hd:2 * H + (h + 1) * hd] = dvh
        dq = dqkv_scratch[:, 0:H]
        dk = dqkv_scratch[:, H:2 * H]
        dv = dqkv_scratch[:, 2 * H:3 * H]
        dbq_ref[:] += jnp.sum(dq, axis=0, keepdims=True)
        dwq_ref[:] += mdot_tn(x, dq)
        dbk_ref[:] += jnp.sum(dk, axis=0, keepdims=True)
        dwk_ref[:] += mdot_tn(x, dk)
        dbv_ref[:] += jnp.sum(dv, axis=0, keepdims=True)
        dwv_ref[:] += mdot_tn(x, dv)
        dx = (dy1 + mdot_nt(dq, wq[:]) + mdot_nt(dk, wk[:])
              + mdot_nt(dv, wv[:]))
        dx_ref[...] = dx.reshape(Bc, TP, H).astype(dx_ref.dtype)
    return kernel


def _make_ffn_bwd_kernel(dims, rates, training, mm16=False, mode="prng"):
    """Backward of LN2 + FFN given saved x1; grid (B, 1). Half of the
    BERT_BWD=split A/B pair (predates the 64 MB vmem_limit)."""
    def kernel(seed_ref, x1_ref, g_ref, w1, b1m, w2, b2m, g2, b2,
               dx1_ref, dw1_ref, db1m_ref, dw2_ref, db2m_ref, dg2_ref,
               db2_ref):
        is_first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0))

        @pl.when(is_first)
        def _():
            for ref in (dw1_ref, db1m_ref, dw2_ref, db2m_ref, dg2_ref,
                        db2_ref):
                ref[:] = jnp.zeros_like(ref)

        dx1 = _ffn_bwd_body(seed_ref, x1_ref[0].astype(jnp.float32),
                            g_ref[0].astype(jnp.float32), w1, b1m, w2, b2m,
                            g2, b2, dw1_ref, db1m_ref, dw2_ref, db2m_ref,
                            dg2_ref, db2_ref, dims, rates, training, mm16,
                            mode)
        dx1_ref[0] = dx1.astype(dx1_ref.dtype)
    return kernel


def _ffn_bwd_body(seed_ref, x1, g, w1, b1m, w2, b2m, g2, b2,
                  dw1_ref, db1m_ref, dw2_ref, db2m_ref, dg2_ref, db2_ref,
                  dims, rates, training, mm16, mode, rows=None, a2=None):
    """LN2+FFN backward math over saved x1; returns dx1 (stays in VMEM when
    called from the merged kernel). Row-count generic: ``rows`` defaults to
    one subject (TP) and is Bc*TP under the batched grid — the math is
    row-wise so the fold is free, and the dropout row origin matches the
    forward's (same grid, same row0).

    ``a2``: the forward-saved pre-LN2 sum (dropout(z) + x1). When given,
    the full FFN forward recompute that existed only to rebuild the LN2
    statistics (2 chunked dots, ~29% of the FFN backward's FLOPs) is
    skipped — the saved f32 value is bitwise what the forward computed, so
    gradients are unchanged (tests/test_bert_megakernel.py A/Bs the plans).
    """
    TP, H, F, heads, T = dims
    R = TP if rows is None else rows
    _, drop_rate = rates
    mdot, mdot_nt, mdot_tn = _mm(mm16)
    row0 = pl.program_id(0) * R

    Fc = _ffn_chunk(F, 256)
    if a2 is None:
        z = jnp.zeros((R, H), jnp.float32) + b2m[:]
        for c0 in range(0, F, Fc):
            u_c = mdot(x1, w1[:, c0:c0 + Fc]) + b1m[:, c0:c0 + Fc]
            z = z + mdot(_gelu_erf(u_c), w2[c0:c0 + Fc, :])
        if training and drop_rate > 0.0:
            m1 = _drop(z.shape, drop_rate, seed_ref, 1, mode, row0)
            z = z * m1
        else:
            m1 = None
        a2 = z + x1
    elif training and drop_rate > 0.0:
        m1 = _drop((R, H), drop_rate, seed_ref, 1, mode, row0)
    else:
        m1 = None
    _, xh2, r2 = _ln_fwd(a2, g2[:], b2[:])

    dg2_ref[:] += jnp.sum(g * xh2, axis=0, keepdims=True)
    db2_ref[:] += jnp.sum(g, axis=0, keepdims=True)
    dy2 = _ln_bwd(g, xh2, r2, g2[:])
    dz = dy2 * m1 if m1 is not None else dy2
    db2m_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dx1 = dy2                                  # residual branch
    for c0 in range(0, F, Fc):
        u_c = mdot(x1, w1[:, c0:c0 + Fc]) + b1m[:, c0:c0 + Fc]
        gu_c = _gelu_erf(u_c)
        dw2_ref[c0:c0 + Fc, :] += mdot_tn(gu_c, dz)
        dgu_c = mdot_nt(dz, w2[c0:c0 + Fc, :])
        du_c = dgu_c * _gelu_erf_grad(u_c)
        db1m_ref[:, c0:c0 + Fc] += jnp.sum(du_c, axis=0, keepdims=True)
        dw1_ref[:, c0:c0 + Fc] += mdot_tn(x1, du_c)
        dx1 = dx1 + mdot_nt(du_c, w1[:, c0:c0 + Fc])
    return dx1


def _attn_bwd_body(seed_ref, x, dx1, wq, bq, wk, bk, wv, bv, wo, bo, g1, b1,
                   dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                   dwo_ref, dbo_ref, dg1_ref, db1_ref, ctx_scratch,
                   dqkv_scratch, dims, rates, training, mm16, mode):
    """Attention-half backward math given d(x1); returns dx."""
    TP, H, F, heads, T = dims
    attn_rate, drop_rate = rates
    hd = H // heads
    scale = hd ** -0.5
    mdot, mdot_nt, mdot_tn = _mm(mm16)

    q = mdot(x, wq[:]) + bq[:]
    k = mdot(x, wk[:]) + bk[:]
    v = mdot(x, wv[:]) + bv[:]
    packed = _ATTN_MODE == "packed"
    if packed:
        ctx, p, pd, K_pack, V_pack = _attn_packed_fwd(
            q, k, v, dims, scale, attn_rate, seed_ref, training, mm16, mode)
    else:
        keypad = _keypad(TP, T)
        for h in range(heads):
            *_, ctx_h = _attn_head(q, k, v, h, heads, hd, scale, keypad,
                                   attn_rate, seed_ref, training, mode, TP)
            ctx_scratch[:, h * hd:(h + 1) * hd] = ctx_h
        ctx = ctx_scratch[:]
    a = mdot(ctx, wo[:]) + bo[:]
    row0 = pl.program_id(0) * TP
    if training and drop_rate > 0.0:
        m0 = _drop(a.shape, drop_rate, seed_ref, 0, mode, row0)
        a = a * m0
    else:
        m0 = None
    _, xh1, r1 = _ln_fwd(a + x, g1[:], b1[:])

    dg1_ref[:] += jnp.sum(dx1 * xh1, axis=0, keepdims=True)
    db1_ref[:] += jnp.sum(dx1, axis=0, keepdims=True)
    dy1 = _ln_bwd(dx1, xh1, r1, g1[:])
    da = dy1 * m0 if m0 is not None else dy1
    dbo_ref[:] += jnp.sum(da, axis=0, keepdims=True)
    dwo_ref[:] += mdot_tn(ctx, da)
    dctx = mdot_nt(da, wo[:])

    if packed:
        G = _fb._seg_matrix(TP, heads)
        dpd = mdot(dctx, V_pack)               # (TP, L)
        dv = _unpack_rows(mdot_tn(pd, dctx), TP, heads, hd)
        if training and attn_rate > 0.0:
            dp = dpd * _drop(dpd.shape, attn_rate, seed_ref, 3, mode, row0)
        else:
            dp = dpd
        seg_sum = _fb._seg_rows(dp * p, G, mm16)  # per-head row sums, packed
        ds = p * (dp - seg_sum)
        dq = mdot_nt(ds, K_pack) * scale
        dk = _unpack_rows(mdot_tn(ds, q * scale), TP, heads, hd)
    else:
        for h in range(heads):
            qh, kh, vh, p, pd, _ = _attn_head(q, k, v, h, heads, hd, scale,
                                              keypad, attn_rate, seed_ref,
                                              training, mode, TP)
            dctx_h = dctx[:, h * hd:(h + 1) * hd]
            dpd = _dot_nt(dctx_h, vh)              # (TP, TP)
            dvh = _dot_tn(pd, dctx_h)              # (TP, hd)
            if training and attn_rate > 0.0:
                dp = dpd * _drop(dpd.shape, attn_rate, seed_ref, 3 + h,
                                 mode, row0)
            else:
                dp = dpd
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dqkv_scratch[:, h * hd:(h + 1) * hd] = _dot(ds, kh) * scale
            dqkv_scratch[:, H + h * hd:H + (h + 1) * hd] = _dot_tn(ds, qh)
            dqkv_scratch[:, 2 * H + h * hd:2 * H + (h + 1) * hd] = dvh
        dq = dqkv_scratch[:, 0:H]
        dk = dqkv_scratch[:, H:2 * H]
        dv = dqkv_scratch[:, 2 * H:3 * H]
    dbq_ref[:] += jnp.sum(dq, axis=0, keepdims=True)
    dwq_ref[:] += mdot_tn(x, dq)
    dbk_ref[:] += jnp.sum(dk, axis=0, keepdims=True)
    dwk_ref[:] += mdot_tn(x, dk)
    dbv_ref[:] += jnp.sum(dv, axis=0, keepdims=True)
    dwv_ref[:] += mdot_tn(x, dv)
    return (dy1 + mdot_nt(dq, wq[:]) + mdot_nt(dk, wk[:])
            + mdot_nt(dv, wv[:]))


def _make_merged_bwd_kernel(dims, rates, training, mm16=False, mode="prng",
                            use_resid=True):
    """ONE backward kernel per layer: FFN/LN2 side over saved x1 (dx1 stays
    in VMEM), then the attention-side recompute + backward. The split
    variant below predates the 64 MB vmem_limit and is kept for A/B
    (BERT_BWD=split). The saved a2 residual (BERT_BWD_RESID) skips the FFN
    forward recompute; ctx is NOT shipped here — the per-subject attention
    backward needs the softmax internals regardless, and its single
    _attn_packed_fwd call already yields ctx for free."""
    def kernel(seed_ref, x_ref, x1_ref, *more):
        if use_resid:
            a2_ref, g_ref = more[0], more[1]
            rest = more[2:]
        else:
            a2_ref = None
            g_ref = more[0]
            rest = more[1:]
        prefs = rest[0:N_PARAMS]
        (wq, bq, wk, bk, wv, bv, wo, bo, g1, b1,
         w1, b1m, w2, b2m, g2, b2) = prefs
        dx_ref = rest[N_PARAMS]
        dp_refs = rest[N_PARAMS + 1:2 * N_PARAMS + 1]
        (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref, dwo_ref,
         dbo_ref, dg1_ref, db1_ref, dw1_ref, db1m_ref, dw2_ref, db2m_ref,
         dg2_ref, db2_ref) = dp_refs
        ctx_scratch, dqkv_scratch = rest[2 * N_PARAMS + 1:]

        is_first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0))

        @pl.when(is_first)
        def _():
            for ref in dp_refs:
                ref[:] = jnp.zeros_like(ref)

        x = x_ref[0].astype(jnp.float32)
        x1 = x1_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        dx1 = _ffn_bwd_body(seed_ref, x1, g, w1, b1m, w2, b2m, g2, b2,
                            dw1_ref, db1m_ref, dw2_ref, db2m_ref, dg2_ref,
                            db2_ref, dims, rates, training, mm16, mode,
                            a2=a2_ref[0] if use_resid else None)
        dx = _attn_bwd_body(seed_ref, x, dx1, wq, bq, wk, bk, wv, bv, wo,
                            bo, g1, b1, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                            dwv_ref, dbv_ref, dwo_ref, dbo_ref, dg1_ref,
                            db1_ref, ctx_scratch, dqkv_scratch, dims, rates,
                            training, mm16, mode)
        dx_ref[0] = dx.astype(dx_ref.dtype)
    return kernel


def _make_attn_bwd_kernel(dims, rates, training, mm16=False, mode="prng"):
    """Backward of the attention half given d(x1); grid (B, 1). Half of the
    BERT_BWD=split A/B pair."""
    def kernel(seed_ref, x_ref, dx1_ref, wq, bq, wk, bk, wv, bv, wo, bo,
               g1, b1, dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref,
               dbv_ref, dwo_ref, dbo_ref, dg1_ref, db1_ref, ctx_scratch,
               dqkv_scratch):
        is_first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0))

        @pl.when(is_first)
        def _():
            for ref in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref,
                        dbv_ref, dwo_ref, dbo_ref, dg1_ref, db1_ref):
                ref[:] = jnp.zeros_like(ref)

        dx = _attn_bwd_body(seed_ref, x_ref[0].astype(jnp.float32),
                            dx1_ref[0].astype(jnp.float32), wq, bq, wk, bk,
                            wv, bv, wo, bo, g1, b1, dwq_ref, dbq_ref,
                            dwk_ref, dbk_ref, dwv_ref, dbv_ref, dwo_ref,
                            dbo_ref, dg1_ref, db1_ref, ctx_scratch,
                            dqkv_scratch, dims, rates, training, mm16, mode)
        dx_ref[0] = dx.astype(dx_ref.dtype)
    return kernel


def _resident(shape):
    return pl.BlockSpec(shape, lambda b, c, *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _specs(TP, H, p_shapes):
    x_spec = pl.BlockSpec((1, TP, H), lambda b, c, *_: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    return [x_spec] + [_resident(s) for s in p_shapes], x_spec


def bert_layer_call(x, params, seed, heads: int, t_valid: int,
                    rates: Tuple[float, float], training: bool,
                    interpret: bool = False, mm16=None):
    """Entry point: one full HF-semantics post-LN BERT layer as a single TPU
    kernel (custom VJP). x: (B, TP, H) tokens padded to TP = round_up(T, 8);
    positions >= t_valid are pads (masked out of attention). params:
    16-tuple (module docstring). rates: (attn_dropout, hidden_dropout).
    ``mm16``: None follows the stream dtype (bf16 stream -> bf16 MXU
    operands); True forces bf16 dots under an f32 stream — the mixed
    operating point nn/bert.py uses under the bf16 compute policy (f32
    residual stream for trainability at depth, bf16 MXU rate)."""
    return _fbl(x, params, seed, heads, t_valid, rates, training, interpret,
                mm16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _fbl(x, params, seed, heads, t_valid, rates, training, interpret, mm16):
    return _fbl_fwd(x, params, seed, heads, t_valid, rates, training,
                    interpret, mm16)[0]


def _dims(x, params, heads, t_valid):
    B, TP, H = x.shape
    F = params[10].shape[1]
    return B, (TP, H, F, heads, t_valid)


def _fbl_fwd(x, params, seed, heads, t_valid, rates, training, interpret,
             mm16=None):
    B, dims = _dims(x, params, heads, t_valid)
    TP, H, F = dims[0], dims[1], dims[2]
    if mm16 is None:
        mm16 = x.dtype == jnp.bfloat16 or _MM16_FORCE
    p_shapes = param_shapes(H, F)
    in_specs, x_spec = _specs(TP, H, p_shapes)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    mode = _fb._mode_for(interpret)
    bc = _bc_for(B) if _GRID_MODE == "batched" else 1
    # ctx/a2 residual saves only exist for a training backward that will
    # consume them — inference (eval/serving) and BERT_BWD_RESID=0 build the
    # 2-output kernel and skip the extra f32 HBM writes (round-4 advisor)
    save_resid = training and _RESID
    n_out = 4 if save_resid else 2
    out_shapes = ([jax.ShapeDtypeStruct(x.shape, x.dtype)] * 2
                  + [jax.ShapeDtypeStruct(x.shape, jnp.float32)] * 2)[:n_out]
    if bc > 1:
        xb_spec = pl.BlockSpec((bc, TP, H), lambda b, c, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            _make_fwd_kernel_batched(dims, rates, training, mm16, mode, bc,
                                     save_resid),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B // bc, 1),
                in_specs=[xb_spec] + [_resident(s) for s in p_shapes],
                out_specs=[xb_spec] * n_out,
                scratch_shapes=[pltpu.VMEM((bc * TP, H), jnp.float32)]),
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=_batched_compiler_params(),
        )(seed_arr, x, *[f32(p) for p in params])
    else:
        outs = pl.pallas_call(
            _make_fwd_kernel(dims, rates, training, mm16, mode, save_resid),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B, 1),
                in_specs=in_specs, out_specs=[x_spec] * n_out,
                scratch_shapes=[pltpu.VMEM((TP, H), jnp.float32)]),
            out_shape=out_shapes,
            interpret=interpret,
            # packed attention's head-packed score pass needs ~17.7 MB of
            # scoped vmem — over the 16 MB Mosaic default; shared 64 MB cap
            compiler_params=_fb._compiler_params(),
        )(seed_arr, x, *[f32(p) for p in params])
    out, x1 = outs[0], outs[1]
    ctx, a2 = (outs[2], outs[3]) if save_resid else (None, None)
    return out, (x, x1, ctx, a2, params, seed_arr)


# BERT_MM16=force: bf16-operand MXU dots even when the token stream is f32
# (normally mm16 follows the stream dtype). This is the "f32 residual
# stream + bf16 matmuls" operating point: measured on v5e, a 16-layer BERT
# under FULL bf16 streams does not train (loss flat at ~0.67 over 150
# steps; the bf16 residual/gradient stream quantizes 16x at the layer
# boundaries) while f32 streams train to 0.006 — this knob keeps the MXU
# at bf16 rate without paying that accuracy cliff.
_MM16_FORCE = os.environ.get("BERT_MM16", "") == "force"

# In-kernel ablations for step attribution (same methodology that cracked
# the fusion kernels, FUSION_ABLATE): forward-path only — measure with
# scripts/bench_bert_micro.py fwd. Never set in production.
#   copy     — load + store only (kernel shell + DMA floor)
#   noattn   — skip attention entirely (ctx = q)
#   dotsonly — QKV + packs + score/context dots, no softmax/keypad/dropout
#   nosm     — everything but the softmax
#   noffn    — skip the chunked FFN
_ABLATE = os.environ.get("BERT_ABLATE", "")

_BWD_MODE = os.environ.get("BERT_BWD", "merged")

# BERT_BWD_RESID (default on): the merged backward kernels consume the
# forward-saved f32 residuals (ctx, a2) instead of recomputing the attention
# forward (batched grid's pass 1) and the chunked FFN forward — ~1/3 of the
# backward's FLOPs for ~2 MB/layer-call of extra HBM. "0" restores the
# recompute-everything behavior (A/B). The saved values are bitwise the
# forward's; the recompute path's gradients differ from them by f32
# summation-order noise (256-chunk FFN rebuild vs the forward's larger
# chunks) — identical to ~1e-5 rtol, not bitwise
# (tests/test_bert_megakernel.py compares at rtol=5e-5).
_RESID = os.environ.get("BERT_BWD_RESID", "1") != "0"


def _fbl_bwd(heads, t_valid, rates, training, interpret, mm16, res, g):
    x, x1, ctx, a2, params, seed_arr = res
    # residuals exist iff the forward saved them (training and BERT_BWD_RESID)
    # — a gradient through a deterministic forward falls back to recompute
    use_resid = ctx is not None
    B, dims = _dims(x, params, heads, t_valid)
    TP, H, F = dims[0], dims[1], dims[2]
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    x_spec = pl.BlockSpec((1, TP, H), lambda b, c, *_: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    if mm16 is None:
        mm16 = x.dtype == jnp.bfloat16 or _MM16_FORCE
    p_shapes = param_shapes(H, F)
    mode = _fb._mode_for(interpret)
    bc = _bc_for(B) if _GRID_MODE == "batched" else 1
    if bc > 1:
        # batched grid implies the merged backward (BERT_BWD split predates
        # the 64 MB vmem cap and exists only for the per-subject A/B)
        xb_spec = pl.BlockSpec((bc, TP, H), lambda b, c, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        resid_args = (ctx, a2) if use_resid else ()
        outs = pl.pallas_call(
            _make_merged_bwd_kernel_batched(dims, rates, training, mm16,
                                            mode, bc, use_resid),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B // bc, 1),
                in_specs=([xb_spec] * (3 + len(resid_args))
                          + [_resident(s) for s in p_shapes]),
                out_specs=[xb_spec] + [_resident(s) for s in p_shapes],
                scratch_shapes=[pltpu.VMEM((bc * TP, H), jnp.float32),
                                pltpu.VMEM((bc * TP, 3 * H), jnp.float32)]),
            out_shape=([jax.ShapeDtypeStruct(x.shape, x.dtype)]
                       + [jax.ShapeDtypeStruct(s, jnp.float32)
                          for s in p_shapes]),
            interpret=interpret,
            compiler_params=_batched_compiler_params(),
        )(seed_arr, x, x1, *resid_args, jnp.asarray(g, x.dtype),
          *[f32(p) for p in params])
        dx = outs[0]
        dparams = tuple(d.astype(jnp.asarray(p).dtype)
                        for d, p in zip(outs[1:], params))
        return dx, dparams, None
    if _BWD_MODE == "merged":
        resid_args = (a2,) if use_resid else ()
        outs = pl.pallas_call(
            _make_merged_bwd_kernel(dims, rates, training, mm16, mode,
                                    use_resid),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B, 1),
                in_specs=([x_spec] * (3 + len(resid_args))
                          + [_resident(s) for s in p_shapes]),
                out_specs=[x_spec] + [_resident(s) for s in p_shapes],
                scratch_shapes=[pltpu.VMEM((TP, H), jnp.float32),
                                pltpu.VMEM((TP, 3 * H), jnp.float32)]),
            out_shape=([jax.ShapeDtypeStruct(x.shape, x.dtype)]
                       + [jax.ShapeDtypeStruct(s, jnp.float32)
                          for s in p_shapes]),
            interpret=interpret,
            compiler_params=_fb._compiler_params(),
        )(seed_arr, x, x1, *resid_args, jnp.asarray(g, x.dtype),
          *[f32(p) for p in params])
        dx = outs[0]
        dparams = tuple(d.astype(jnp.asarray(p).dtype)
                        for d, p in zip(outs[1:], params))
        return dx, dparams, None

    ffn_p = params[10:16]
    ffn_shapes = p_shapes[10:16]
    ffn_outs = pl.pallas_call(
        _make_ffn_bwd_kernel(dims, rates, training, mm16, mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, 1),
            in_specs=[x_spec, x_spec] + [_resident(s) for s in ffn_shapes],
            out_specs=[x_spec] + [_resident(s) for s in ffn_shapes]),
        out_shape=([jax.ShapeDtypeStruct(x.shape, x.dtype)]
                   + [jax.ShapeDtypeStruct(s, jnp.float32)
                      for s in ffn_shapes]),
        interpret=interpret,
        compiler_params=_fb._compiler_params(),
    )(seed_arr, x1, jnp.asarray(g, x.dtype), *[f32(p) for p in ffn_p])
    dx1, dffn = ffn_outs[0], ffn_outs[1:]

    attn_p = params[0:10]
    attn_shapes = p_shapes[0:10]
    attn_outs = pl.pallas_call(
        _make_attn_bwd_kernel(dims, rates, training, mm16, mode),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, 1),
            in_specs=[x_spec, x_spec] + [_resident(s) for s in attn_shapes],
            out_specs=[x_spec] + [_resident(s) for s in attn_shapes],
            scratch_shapes=[pltpu.VMEM((TP, H), jnp.float32),
                            pltpu.VMEM((TP, 3 * H), jnp.float32)]),
        out_shape=([jax.ShapeDtypeStruct(x.shape, x.dtype)]
                   + [jax.ShapeDtypeStruct(s, jnp.float32)
                      for s in attn_shapes]),
        interpret=interpret,
        compiler_params=_fb._compiler_params(),
    )(seed_arr, x, dx1, *[f32(p) for p in attn_p])
    dx = attn_outs[0]
    dparams = tuple(d.astype(jnp.asarray(p).dtype)
                    for d, p in zip(list(attn_outs[1:]) + list(dffn), params))
    return dx, dparams, None


_fbl.defvjp(_fbl_fwd, _fbl_bwd)


def bert_layer_reference(x, params, heads: int, t_valid: int):
    """Differentiable jnp twin (deterministic) over the same params/layout."""
    (wq, bq, wk, bk, wv, bv, wo, bo, g1, b1,
     w1, b1m, w2, b2m, g2, b2) = [jnp.asarray(p, jnp.float32) for p in params]
    B, TP, H = x.shape
    hd = H // heads
    xf = jnp.asarray(x, jnp.float32)
    q = xf @ wq + bq[0]
    k = xf @ wk + bk[0]
    v = xf @ wv + bv[0]

    def split(t):
        return t.reshape(B, TP, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q) * (hd ** -0.5), split(k), split(v)
    s = jnp.einsum("bhtd,bhsd->bhts", qh, kh)
    col = jnp.arange(TP)
    s = jnp.where(col[None, None, None, :] >= t_valid, _NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhts,bhsd->bhtd", p, vh)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, TP, H)
    a = ctx @ wo + bo[0]
    x1, _, _ = _ln_fwd(a + xf, g1, b1)
    z = _gelu_erf(x1 @ w1 + b1m[0]) @ w2 + b2m[0]
    out, _, _ = _ln_fwd(z + x1, g2, b2)
    return out.astype(x.dtype)
