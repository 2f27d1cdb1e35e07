"""Batch-lane-packed (BP) fused SwinFusion block kernels.

Motivation: the flagship fusion geometry is C=12 channels (reference
model.py:1160 fusion embed). In the (B, nW, NP, C) kernels of
ops/fusion_block.py every stream op runs on (R, 12) tiles — 12 of 128 VPU
lanes live (~9%) — and the per-cell tensors are so small that fixed per-op
pipeline overheads dominate (measured: kernels are VPU-throughput-bound
while MXU/DMA idle; ROADMAP "Fusion-kernel perf findings").

BP layout folds the BATCH onto the lane axis: tokens ride ``(nW, NP, B*C)``
with lane ``l = b*C + c``. Everything widens 8x (B=8) at the same total
element count:

  * stream ops (LN, projections, MLP, dropout, residuals) run at
    B*C/128 = 75% lane utilization instead of 9%;
  * LayerNorm's per-group mean/var become ONE MXU dot against the constant
    block matrix kron(I_B, 1/C) instead of cross-lane reduces;
  * weights become block-diagonal kron(I_B, W) — built XLA-side per call,
    the MXU multiplies the zeros for free and K grows 12 -> 96;
  * the head-packed attention of fusion_block.py generalizes verbatim with
    C -> B*C and H -> B*H (lane block (b, h) instead of h): _pack_kv,
    _packed_scores, _packed_softmax and _seg_matrix are reused as-is;
  * the grid loses its batch dimension: 8x fewer, 8x denser cells.

Param/bias gradients are accumulated in BP (block-diagonal) shape inside
the kernel and folded back to the original shapes by the custom-VJP wrapper
(sum of the B diagonal blocks — XLA-side, tiny).

Batch-GROUP grid (B > G): the lane fold is capped at G subjects (default 8
— the fold that saturates the 128 lanes at C=12 while the zero blocks of
kron(I_G, W) still hide inside the K pad). Larger batches split into
ngroups = B/G independent lane groups that ride a leading grid axis: the
stream converts to (ngroups, nW, NP, G*C) at kernel entry, every grid cell
processes one (group, window-chunk) pair, and the kron weights / packed
attention / masks stay G-sized. Total MXU work is LINEAR in B with
constant lane packing — the naive fold's kron dots and BH-packed scores
were O(B^2) (measured: 7554 ms/step at bs=16 vs 109 at bs=8, ROADMAP
round-3 matrix). Param/bias grads accumulate across ALL cells (groups
included) into the same G-sized accumulator blocks, so the XLA-side fold
is unchanged. At B <= G this reduces exactly to the single-group kernel
(same grid, same dropout hash keys, same numerics).

Same contracts as fusion_block.py otherwise: pre-norm block, -1e9 pad/mask
columns, per-(cell, draw) PRNG dropout regeneration (fwd and bwd run the
same 1-D grid), hash-mask fallback for the HLO interpreter. Replaces the
same reference code (swinfusion_module.py:265-558) as fusion_block.py —
this is an alternative execution plan, selected via nn/swinfusion.py's
FUSION_LAYOUT=bp.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_neuroimage_tpu.ops import fusion_block as fb
from multimodal_neuroimage_tpu.ops.fusion_block import (
    _DRAW_MLP1, _DRAW_MLP2, _DRAW_PROJ, _LN_EPS, _bdot, _dot, _dot_nt,
    _dot_tn, _gelu, _gelu_grad, _keep_scale, _mix_keep, _mode_for,
    _pack_kv, _packed_scores, _packed_softmax, _seg_matrix)

# ---------------------------------------------------------------------------
# BP layout converters (module entry/exit; also used by parity tests)
# ---------------------------------------------------------------------------


def to_bp(x):
    """(B, nW, NP, C) -> (nW, NP, B*C), lane l = b*C + c."""
    B, nW, NP, C = x.shape
    return jnp.transpose(x, (1, 2, 0, 3)).reshape(nW, NP, B * C)


def from_bp(x_bp, B: int):
    """(nW, NP, B*C) -> (B, nW, NP, C)."""
    nW, NP, BC = x_bp.shape
    return jnp.transpose(x_bp.reshape(nW, NP, B, BC // B), (2, 0, 1, 3))


def group_size(B: int) -> int:
    """Lane-fold cap: largest divisor of B that is <= FUSION_BP_GROUP
    (default 8). Lane l = b*C + c is group-contiguous, so group g owns the
    lane slab [g*G*C, (g+1)*G*C) of the public (nW, NP, B*C) stream."""
    cap = max(1, int(os.environ.get("FUSION_BP_GROUP", "8")))
    g = min(B, cap)
    while B % g:
        g -= 1
    return g


def _to_groups(x, ngroups: int):
    """(nW, NP, B*C) -> (ngroups, nW, NP, G*C). Free at ngroups=1; one
    lane-split transpose otherwise. Round-5 note: the module-level stacks
    now keep their streams group-major across whole stacks (nn/swinfusion
    group-major glue), so on the hot path this is only paid at stack
    entry/exit, not per kernel call — the per-call conversion below remains
    for 3-D (legacy/parity-test) callers."""
    nW, NP, BC = x.shape
    if ngroups == 1:
        return x[None]
    return jnp.transpose(x.reshape(nW, NP, ngroups, BC // ngroups),
                         (2, 0, 1, 3))


def _from_groups(x4):
    """(ngroups, nW, NP, G*C) -> (nW, NP, B*C)."""
    ngroups, nW, NP, GC = x4.shape
    if ngroups == 1:
        return x4[0]
    return jnp.transpose(x4, (1, 2, 0, 3)).reshape(nW, NP, ngroups * GC)


def _stream_geom(x, B: int):
    """(ngroups, grouped) for a public 3-D (nW, NP, B*C) or group-major 4-D
    (ngroups, nW, NP, G*C) stream. A 4-D stream's group split is whatever
    the caller built (it must match group_size(B) so masks/grid agree)."""
    if x.ndim == 4:
        return x.shape[0], True
    return B // group_size(B), False


# ---------------------------------------------------------------------------
# XLA-side parameter expansion (fwd) and gradient folding (bwd)
# ---------------------------------------------------------------------------


def _kron_eye(W, B: int):
    """(Ci, Co) -> block-diagonal (B*Ci, B*Co) = kron(I_B, W)."""
    Ci, Co = W.shape
    out = jnp.einsum("bd,ij->bidj", jnp.eye(B, dtype=W.dtype), W)
    return out.reshape(B * Ci, B * Co)


def _fold_kron(dW_bp, B: int):
    """Sum the B diagonal (Ci, Co) blocks of a (B*Ci, B*Co) gradient."""
    BCi, BCo = dW_bp.shape
    return jnp.einsum("bibj->ij", dW_bp.reshape(B, BCi // B, B, BCo // B))


def _tile_lane(v, B: int):
    """(1, C) -> (1, B*C) lane tile."""
    return jnp.tile(v, (1, B))


def _fold_lane(dv_bp, B: int):
    """(1, B*C) -> (1, C): sum the B lane copies."""
    return dv_bp.reshape(B, dv_bp.shape[1] // B).sum(0, keepdims=True)


def _mean_matrix(B: int, C: int):
    """kron(I_B, ones(C,C)/C): one MXU dot = per-C-group mean broadcast."""
    return _kron_eye(jnp.full((C, C), 1.0 / C, jnp.float32), B)


def _expand_params(params, B: int, cross: bool):
    """Original param tuple -> BP kernel tensors (fixed order)."""
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    if cross:
        (g1, b1, g1y, b1y, wq, bq, wkv, bkv,
         wp, bpj, g2, b2, w1, b1m, w2, b2m) = map(f32, params)
        C = g1.shape[1]
        wk, wv = wkv[:, :C], wkv[:, C:]
        bk, bv = bkv[:, :C], bkv[:, C:]
        head = (_tile_lane(g1, B), _tile_lane(b1, B),
                _tile_lane(g1y, B), _tile_lane(b1y, B))
    else:
        (g1, b1, wqkv, bqkv, wp, bpj, g2, b2, w1, b1m, w2, b2m) = map(
            f32, params)
        C = g1.shape[1]
        wq, wk, wv = wqkv[:, :C], wqkv[:, C:2 * C], wqkv[:, 2 * C:]
        bq, bk, bv = bqkv[:, :C], bqkv[:, C:2 * C], bqkv[:, 2 * C:]
        head = (_tile_lane(g1, B), _tile_lane(b1, B))
    return head + (
        _kron_eye(wq, B), _tile_lane(bq, B),
        _kron_eye(wk, B), _tile_lane(bk, B),
        _kron_eye(wv, B), _tile_lane(bv, B),
        _kron_eye(wp, B), _tile_lane(bpj, B),
        _tile_lane(g2, B), _tile_lane(b2, B),
        _kron_eye(w1, B), _tile_lane(b1m, B),
        _kron_eye(w2, B), _tile_lane(b2m, B),
        _mean_matrix(B, C))


def _n_bp(cross: bool) -> int:
    """Number of expanded kernel param tensors (incl. the mean matrix)."""
    return 19 if cross else 17


def _fold_grads(d_bp, B: int, cross: bool):
    """BP-shaped kernel grads (minus the mean matrix — not a param) back to
    the original param tuple order."""
    if cross:
        (dg1, db1, dg1y, db1y, dWq, dbq, dWk, dbk, dWv, dbv,
         dwp, dbpj, dg2, db2, dw1, db1m, dw2, db2m) = d_bp
        dwkv = jnp.concatenate([_fold_kron(dWk, B), _fold_kron(dWv, B)],
                               axis=1)
        dbkv = jnp.concatenate([_fold_lane(dbk, B), _fold_lane(dbv, B)],
                               axis=1)
        return (_fold_lane(dg1, B), _fold_lane(db1, B),
                _fold_lane(dg1y, B), _fold_lane(db1y, B),
                _fold_kron(dWq, B), _fold_lane(dbq, B), dwkv, dbkv,
                _fold_kron(dwp, B), _fold_lane(dbpj, B),
                _fold_lane(dg2, B), _fold_lane(db2, B),
                _fold_kron(dw1, B), _fold_lane(db1m, B),
                _fold_kron(dw2, B), _fold_lane(db2m, B))
    (dg1, db1, dWq, dbq, dWk, dbk, dWv, dbv,
     dwp, dbpj, dg2, db2, dw1, db1m, dw2, db2m) = d_bp
    dwqkv = jnp.concatenate([_fold_kron(dWq, B), _fold_kron(dWk, B),
                             _fold_kron(dWv, B)], axis=1)
    dbqkv = jnp.concatenate([_fold_lane(dbq, B), _fold_lane(dbk, B),
                             _fold_lane(dbv, B)], axis=1)
    return (_fold_lane(dg1, B), _fold_lane(db1, B), dwqkv, dbqkv,
            _fold_kron(dwp, B), _fold_lane(dbpj, B),
            _fold_lane(dg2, B), _fold_lane(db2, B),
            _fold_kron(dw1, B), _fold_lane(db1m, B),
            _fold_kron(dw2, B), _fold_lane(db2m, B))


def _bp_grad_shapes(B: int, C: int, Ch: int, cross: bool):
    BC, BCh = B * C, B * Ch
    head = ([(1, BC)] * 4) if cross else ([(1, BC)] * 2)
    return head + [(BC, BC), (1, BC), (BC, BC), (1, BC), (BC, BC), (1, BC),
                   (BC, BC), (1, BC), (1, BC), (1, BC),
                   (BC, BCh), (1, BCh), (BCh, BC), (1, BC)]


def _tile_mask_lanes(mask_ref, BH: int):
    """In-kernel (Wc, NP, NP) -> (Wc, NP, BH*NP) lane tile of the additive
    shift mask. The mask used to arrive PRE-TILED from XLA as a
    (nW, NP, BH*NP) f32 constant — 60 MB of HBM DMA per kernel call at the
    flagship geometry, which the copy-ablation measured as most of the
    0.19 ms/block shell floor. Tiling the 1.2 MB small mask inside VMEM is
    a ~20 us VPU copy instead."""
    if mask_ref is None:
        return None
    m = mask_ref[:]
    return jnp.concatenate([m] * BH, axis=2)


# ---------------------------------------------------------------------------
# in-kernel pieces (1-D grid variants of fusion_block.py helpers)
# ---------------------------------------------------------------------------


def _prng_keep1(shape, rate: float, seed, draw: int):
    """1-D-grid variant of fusion_block._prng_keep (same seed hash)."""
    fb._prng_seed_cell(seed, draw, pl.program_id(0))
    return _keep_scale(shape, rate)


def _keep2_bp(shape, rate: float, seed, draw: int, row0, col0, mode: str):
    """(R, lanes) stream mask; lane encodes (b, c) so masks differ per
    sample. Hash keys: global token row, GLOBAL lane column (col0 = group
    lane offset, so groups draw distinct masks)."""
    if mode == "prng":
        return _prng_keep1(shape, rate, seed, draw)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
    return _mix_keep(r, c, rate, seed, draw)


def _keep3_bp(shape, rate: float, seed, draw: int, w0, m0, mode: str):
    """(Wc, NP, L_bp) attention mask; lane encodes (b, h, n); m0 = group
    lane offset (g * L) keeps groups' masks distinct."""
    if mode == "prng":
        return _prng_keep1(shape, rate, seed, draw)
    NP = shape[1]
    w = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + w0
    n = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    m = jax.lax.broadcasted_iota(jnp.int32, shape, 2) + m0
    return _mix_keep(w * NP + n, m, rate, seed, draw)


def _ln_fwd_bp(x, g, b, M, eps: float = _LN_EPS):
    """Group LayerNorm over each C-lane block via the mean matrix M."""
    mu = _dot(x, M)
    xc = x - mu
    var = _dot(xc * xc, M)
    r = jax.lax.rsqrt(var + eps)
    xh = xc * r
    return xh * g + b, xh, r


def _ln_bwd_bp(dh, xh, r, g, M):
    dxh = dh * g
    m1 = _dot(dxh, M)
    m2 = _dot(dxh * xh, M)
    return r * (dxh - m1 - xh * m2)


def _unstack_bp(full, Wc: int, BH: int, NP: int, BC: int):
    """(Wc, L_bp, BC) -> (Wc, NP, BC): zero cross-block lanes, then sum the
    BH row blocks (tile-preserving sublane reshape; NP is a multiple of 8)."""
    hd = BC // BH
    lr = jax.lax.broadcasted_iota(jnp.int32, (BH * NP, BC), 0) // NP
    ld = jax.lax.broadcasted_iota(jnp.int32, (BH * NP, BC), 1) // hd
    sel = (lr == ld).astype(jnp.float32)
    return (full * sel[None]).reshape(Wc, BH, NP, BC).sum(axis=1)


def _mm_bp(mm16: bool):
    """Dot quartet (dot, dot_nt, dot_tn, bdot): bf16 operands / f32
    accumulation when the streams are bf16 — f32 matmuls run at ~1/4 the
    MXU rate on v5e, and the BP kernels' packed score/context dots are the
    bulk of their MXU work. The f32 path keeps exact parity with the jnp
    twin (tests/test_fusion_bp.py runs f32 inputs). FUSION_MM16=0 pins f32
    for A/B."""
    if not mm16:
        return _dot, _dot_nt, _dot_tn, _bdot
    c = lambda t: t.astype(jnp.bfloat16)
    return (lambda a, b: _dot(c(a), c(b)),
            lambda a, b: _dot_nt(c(a), c(b)),
            lambda a, b: _dot_tn(c(a), c(b)),
            lambda a, b, ca, cb: _bdot(c(a), c(b), ca, cb))


_MM16_ENABLED = os.environ.get("FUSION_MM16", "1") != "0"


def _forward_bp(seed_ref, x_ref, y_ref, dpl_ref, bias_ref, mask_ref, prefs,
                dims, rates, training, cross, mode, mm16=False):
    """Shared BP forward. Returns (out, x2r). Grid is flat
    (ngroups * n_chunks,) group-major; BC/BH here are the per-GROUP lane
    sizes (G*C / G*H)."""
    Wc, NP, BC, BH, BCh, n_chunks = dims
    attn_rate, drop_rate = rates
    hd = BC // BH
    L = BH * NP
    scale = hd ** -0.5
    R = Wc * NP
    seed = seed_ref[0]
    gi = pl.program_id(0) // n_chunks              # lane group
    wkey0 = (pl.program_id(0) % n_chunks) * Wc     # global window offset
    row0 = wkey0 * NP
    col0 = gi * BC                                 # global lane offsets for
    m0 = gi * L                                    # group-distinct masks
    mdot, mdot_nt, mdot_tn, mbdot = _mm_bp(mm16)

    if cross:
        (g1, b1, g1y, b1y, Wq, bq, Wk, bk, Wv, bv, wp, bpj,
         g2, b2, w1, b1m, w2, b2m, M) = prefs
    else:
        (g1, b1, Wq, bq, Wk, bk, Wv, bv, wp, bpj,
         g2, b2, w1, b1m, w2, b2m, M) = prefs

    x2 = x_ref[:].astype(jnp.float32).reshape(R, BC)
    if fb._ABLATE == "copy":                       # launch + DMA floor
        return x2, x2
    h1, xh1, r1 = _ln_fwd_bp(x2, g1[:], b1[:], M[:])
    if cross:
        y2 = y_ref[:].astype(jnp.float32).reshape(R, BC)
        hk, _, _ = _ln_fwd_bp(y2, g1y[:], b1y[:], M[:])
    else:
        hk = h1
    q3 = (mdot(h1, Wq[:]) + bq[:]).reshape(Wc, NP, BC)
    k3 = (mdot(hk, Wk[:]) + bk[:]).reshape(Wc, NP, BC)
    v3 = (mdot(hk, Wv[:]) + bv[:]).reshape(Wc, NP, BC)

    if fb._ABLATE == "noheads":                    # skip attention entirely
        o2 = q3.reshape(R, BC)
    else:
        K_pack = _pack_kv(k3, BH, mm16)            # (Wc, BC, L)
        V_pack = _pack_kv(v3, BH, mm16)
        if fb._ABLATE == "dotsonly":               # packed dots + packs only
            p = mbdot(q3 * scale, K_pack, 2, 1) * 0.01
        else:
            S = _packed_scores(q3 * scale, K_pack, bias_ref,
                               _tile_mask_lanes(mask_ref, BH), BH,
                               bdot=mbdot)
            if fb._ABLATE == "nosm":               # skip the softmax
                p = S * 0.01
            else:
                p = _packed_softmax(S, _seg_matrix(NP, BH), Wc, NP, L, mm16)
        if training and attn_rate > 0.0:
            p = p * _keep3_bp(p.shape, attn_rate, seed, 3, wkey0, m0,
                              mode)
        o2 = mbdot(p, V_pack, 2, 2).reshape(R, BC)
    a = mdot(o2, wp[:]) + bpj[:]
    if training and drop_rate > 0.0:
        a = a * _keep2_bp(a.shape, drop_rate, seed, _DRAW_PROJ, row0,
                          col0, mode)
    dpl = dpl_ref[:].reshape(2, BC)                # (1,2,GC) block
    dp1 = dpl[0:1, :]                              # (1, BC) DropPath
    dp2 = dpl[1:2, :]
    x2r = x2 + dp1 * a
    if fb._ABLATE == "nomlp":                      # skip LN2 + MLP
        return x2r, x2r
    h2, _, _ = _ln_fwd_bp(x2r, g2[:], b2[:], M[:])
    u = mdot(h2, w1[:]) + b1m[:]
    gu = _gelu(u)
    if training and drop_rate > 0.0:
        gu = gu * _keep2_bp(gu.shape, drop_rate, seed, _DRAW_MLP1, row0,
                            col0, mode)
    z = mdot(gu, w2[:]) + b2m[:]
    if training and drop_rate > 0.0:
        z = z * _keep2_bp(z.shape, drop_rate, seed, _DRAW_MLP2, row0,
                          col0, mode)
    out = x2r + dp2 * z
    return out, x2r


def _make_fwd_kernel_bp(dims, rates, training, with_mask, cross, mode,
                        mm16=False):
    np_ = _n_bp(cross)

    def kernel(seed_ref, x_ref, *rest):
        i = 0
        y_ref = rest[i] if cross else None
        i += 1 if cross else 0
        dpl_ref, bias_ref = rest[i], rest[i + 1]
        i += 2
        mask_ref = rest[i] if with_mask else None
        i += 1 if with_mask else 0
        prefs = rest[i:i + np_]
        o_ref, x2r_ref = rest[-2], rest[-1]
        out, x2r = _forward_bp(seed_ref, x_ref, y_ref, dpl_ref, bias_ref,
                               mask_ref, prefs, dims, rates, training,
                               cross, mode, mm16)
        o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)
        x2r_ref[:] = x2r.reshape(x2r_ref.shape).astype(x2r_ref.dtype)
    return kernel


def _make_bwd_kernel_bp(dims, rates, training, with_mask, cross, mode,
                        mm16=False):
    """Single merged BP backward (mirror of fusion_block._make_bwd_kernel):
    MLP/LN2 backward over saved x2r, then packed attention recompute +
    backward; grads accumulate across the sequential 1-D grid."""
    np_ = _n_bp(cross)

    def kernel(seed_ref, x_ref, *rest):
        i = 0
        y_ref = rest[i] if cross else None
        i += 1 if cross else 0
        x2r_ref, g_ref = rest[i], rest[i + 1]
        dpl_ref, bias_ref = rest[i + 2], rest[i + 3]
        i += 4
        mask_ref = rest[i] if with_mask else None
        i += 1 if with_mask else 0
        prefs = rest[i:i + np_]
        outs = rest[i + np_:]
        if cross:
            (g1, b1, g1y, b1y, Wq, bq, Wk, bk, Wv, bv, wp, bpj,
             g2, b2, w1, b1m, w2, b2m, M) = prefs
            dx_ref, dy_ref, dbias_ref = outs[0], outs[1], outs[2]
            dp_refs = outs[3:]
            (dg1_ref, db1_ref, dg1y_ref, db1y_ref, dWq_ref, dbq_ref,
             dWk_ref, dbk_ref, dWv_ref, dbv_ref, dwp_ref, dbpj_ref,
             dg2_ref, db2_ref, dw1_ref, db1m_ref, dw2_ref,
             db2m_ref) = dp_refs
        else:
            (g1, b1, Wq, bq, Wk, bk, Wv, bv, wp, bpj,
             g2, b2, w1, b1m, w2, b2m, M) = prefs
            dx_ref, dbias_ref = outs[0], outs[1]
            dp_refs = outs[2:]
            (dg1_ref, db1_ref, dWq_ref, dbq_ref, dWk_ref, dbk_ref,
             dWv_ref, dbv_ref, dwp_ref, dbpj_ref, dg2_ref, db2_ref,
             dw1_ref, db1m_ref, dw2_ref, db2m_ref) = dp_refs

        Wc, NP, BC, BH, BCh, n_chunks = dims
        attn_rate, drop_rate = rates
        hd = BC // BH
        L = BH * NP
        scale = hd ** -0.5
        R = Wc * NP
        seed = seed_ref[0]
        gi = pl.program_id(0) // n_chunks
        wkey0 = (pl.program_id(0) % n_chunks) * Wc
        row0 = wkey0 * NP
        col0 = gi * BC
        m0 = gi * L
        with_drop = training and drop_rate > 0.0
        mdot, mdot_nt, mdot_tn, mbdot = _mm_bp(mm16)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for ref in (dbias_ref,) + tuple(dp_refs):
                ref[:] = jnp.zeros_like(ref)

        if fb._ABLATE == "copy":                   # launch + DMA floor
            dx_ref[:] = g_ref[:].astype(dx_ref.dtype)
            if cross:
                dy_ref[:] = g_ref[:].astype(dy_ref.dtype)
            return

        # ---- MLP/LN2 backward over saved x2r ------------------------------
        x2r = x2r_ref[:].astype(jnp.float32).reshape(R, BC)
        g = g_ref[:].astype(jnp.float32).reshape(R, BC)
        dpl = dpl_ref[:].reshape(2, BC)
        dp1 = dpl[0:1, :]
        dp2 = dpl[1:2, :]

        if fb._ABLATE == "nomlp":                  # skip LN2 + MLP backward
            dx2r = g
        else:
            dz = dp2 * g
            if with_drop:
                dz = dz * _keep2_bp(dz.shape, drop_rate, seed, _DRAW_MLP2,
                                    row0, col0, mode)
            db2m_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
            h2, xh2, r2 = _ln_fwd_bp(x2r, g2[:], b2[:], M[:])
            u = mdot(h2, w1[:]) + b1m[:]
            gu = _gelu(u)
            if with_drop:
                m1 = _keep2_bp(gu.shape, drop_rate, seed, _DRAW_MLP1, row0,
                               col0, mode)
                gu = gu * m1
            else:
                m1 = None
            dw2_ref[:] += mdot_tn(gu, dz)
            dgu = mdot_nt(dz, w2[:])
            if m1 is not None:
                dgu = dgu * m1
            du = dgu * _gelu_grad(u)
            db1m_ref[:] += jnp.sum(du, axis=0, keepdims=True)
            dw1_ref[:] += mdot_tn(h2, du)
            dh2 = mdot_nt(du, w1[:])
            dg2_ref[:] += jnp.sum(dh2 * xh2, axis=0, keepdims=True)
            db2_ref[:] += jnp.sum(dh2, axis=0, keepdims=True)
            dx2r = g + _ln_bwd_bp(dh2, xh2, r2, g2[:], M[:])

        # ---- recompute LN1 + q/k/v ----------------------------------------
        x2 = x_ref[:].astype(jnp.float32).reshape(R, BC)
        h1, xh1, r1 = _ln_fwd_bp(x2, g1[:], b1[:], M[:])
        if cross:
            y2 = y_ref[:].astype(jnp.float32).reshape(R, BC)
            hk, xh1y, r1y = _ln_fwd_bp(y2, g1y[:], b1y[:], M[:])
        else:
            hk, xh1y, r1y = h1, None, None
        q3 = (mdot(h1, Wq[:]) + bq[:]).reshape(Wc, NP, BC)
        k3 = (mdot(hk, Wk[:]) + bk[:]).reshape(Wc, NP, BC)
        v3 = (mdot(hk, Wv[:]) + bv[:]).reshape(Wc, NP, BC)

        da = dp1 * dx2r
        if with_drop:
            da = da * _keep2_bp(da.shape, drop_rate, seed, _DRAW_PROJ,
                                row0, col0, mode)
        do2 = mdot_nt(da, wp[:])
        do3 = do2.reshape(Wc, NP, BC)

        # ---- packed attention recompute + backward -------------------------
        q3s = q3 * scale
        if fb._ABLATE == "noheads":                # attention-free twin
            o2 = q3.reshape(R, BC)
            dq = do2
            dk = jnp.zeros_like(do2)
            dv = jnp.zeros_like(do2)
        else:
            G = _seg_matrix(NP, BH)
            K_pack = _pack_kv(k3, BH, mm16)
            V_pack = _pack_kv(v3, BH, mm16)
            if fb._ABLATE == "dotsonly":           # packed dots + packs only
                p = mbdot(q3s, K_pack, 2, 1) * 0.01
            else:
                S = _packed_scores(q3s, K_pack, bias_ref,
                                   _tile_mask_lanes(mask_ref, BH), BH,
                                   bdot=mbdot)
                if fb._ABLATE == "nosm":           # skip the softmax
                    p = S * 0.01
                else:
                    p = _packed_softmax(S, G, Wc, NP, L, mm16)
            if training and attn_rate > 0.0:
                keep = _keep3_bp((Wc, NP, L), attn_rate, seed, 3, wkey0,
                                 m0, mode)
                pd = p * keep
            else:
                keep = None
                pd = p
            o2 = mbdot(pd, V_pack, 2, 2).reshape(R, BC)

            dpd = mbdot(do3, V_pack, 2, 1)             # (Wc, NP, L)
            if fb._ABLATE == "nounstack":  # dv/dk path cost probe
                dvf = None
                dv3 = do3 * 0.01
            else:
                dvf = mbdot(pd, do3, 1, 1)             # (Wc, L, BC)
                dv3 = (dvf[:, :NP, :] if fb._ABLATE == "nofold"
                       else _unstack_bp(dvf, Wc, BH, NP, BC))
            dp_ = dpd * keep if keep is not None else dpd
            if fb._ABLATE in ("dotsonly", "nosm"):     # skip softmax bwd
                ds = dp_ * 0.01
            else:
                t = (dp_ * p).reshape(R, L)
                seg = fb._seg_rows(t, G, mm16).reshape(Wc, NP, L)
                ds = p * (dp_ - seg)
            dbias_ref[:] += jnp.sum(ds, axis=0)        # (NP, L)
            dq3 = mbdot(ds, K_pack, 2, 2) * scale      # (Wc, NP, BC)
            if fb._ABLATE == "nounstack":  # dv/dk path cost probe
                dk3 = dq3 * 0.01
            else:
                dkf = mbdot(ds, q3s, 1, 1)             # (Wc, L, BC)
                dk3 = (dkf[:, :NP, :] if fb._ABLATE == "nofold"
                       else _unstack_bp(dkf, Wc, BH, NP, BC))
            dq = dq3.reshape(R, BC)
            dk = dk3.reshape(R, BC)
            dv = dv3.reshape(R, BC)

        dbpj_ref[:] += jnp.sum(da, axis=0, keepdims=True)
        dwp_ref[:] += mdot_tn(o2, da)
        dbq_ref[:] += jnp.sum(dq, axis=0, keepdims=True)
        dbk_ref[:] += jnp.sum(dk, axis=0, keepdims=True)
        dbv_ref[:] += jnp.sum(dv, axis=0, keepdims=True)
        dWq_ref[:] += mdot_tn(h1, dq)
        dWk_ref[:] += mdot_tn(hk, dk)
        dWv_ref[:] += mdot_tn(hk, dv)
        dh1 = mdot_nt(dq, Wq[:])
        dhk = mdot_nt(dk, Wk[:]) + mdot_nt(dv, Wv[:])
        if cross:
            dg1y_ref[:] += jnp.sum(dhk * xh1y, axis=0, keepdims=True)
            db1y_ref[:] += jnp.sum(dhk, axis=0, keepdims=True)
            dy = _ln_bwd_bp(dhk, xh1y, r1y, g1y[:], M[:])
            dy_ref[:] = dy.reshape(dy_ref.shape).astype(dy_ref.dtype)
        else:
            dh1 = dh1 + dhk
        dg1_ref[:] += jnp.sum(dh1 * xh1, axis=0, keepdims=True)
        db1_ref[:] += jnp.sum(dh1, axis=0, keepdims=True)
        dx = dx2r + _ln_bwd_bp(dh1, xh1, r1, g1[:], M[:])
        dx_ref[:] = dx.reshape(dx_ref.shape).astype(dx_ref.dtype)
    return kernel


# ---------------------------------------------------------------------------
# window-chunk sizing (actual-bytes estimate; budgets under the 64 MB cap)
# ---------------------------------------------------------------------------

_BP_BUDGET = int(float(os.environ.get("FUSION_BP_BUDGET_MB", "44"))
                 * 1024 * 1024)


def _chunk_bp(nW: int, NP: int, BC: int, L: int, bwd: bool) -> int:
    """Largest divisor of nW whose estimated live set fits the budget."""
    if bwd:
        per_w = (4 * BC * L + 6 * NP * L + 12 * NP * BC) * 4
    else:
        per_w = (2 * BC * L + 3 * NP * L + 8 * NP * BC) * 4
    cap = max(1, _BP_BUDGET // per_w)
    best = 1
    for w in range(1, nW + 1):
        if nW % w == 0 and w <= cap:
            best = w
    return best


def _grid_chunk(nW, NP, BC, L, mode):
    """prng masks need fwd and bwd on the SAME grid -> both use the bwd
    (smaller) chunk; hash masks are chunk-invariant so each side picks its
    own largest chunk."""
    wb = _chunk_bp(nW, NP, BC, L, bwd=True)
    wf = wb if mode == "prng" else _chunk_bp(nW, NP, BC, L, bwd=False)
    return wf, wb


def _x_spec_bp(Wc, NP, GC, n_chunks):
    """Stream BlockSpec on the (ngroups, nW, NP, G*C) group-major array:
    flat grid cell i = (group, window-chunk) = (i // n_chunks, i % n_chunks).
    The lane axis is never blocked (full G*C minor dim) — Mosaic-legal at
    any G*C."""
    return pl.BlockSpec((1, Wc, NP, GC),
                        lambda i, *_: (i // n_chunks, i % n_chunks, 0, 0),
                        memory_space=pltpu.VMEM)


def _mask_spec_bp(Wc, NP, n_chunks):
    return pl.BlockSpec((Wc, NP, NP),
                        lambda i, *_: (i % n_chunks, 0, 0),
                        memory_space=pltpu.VMEM)


def _dpl_spec_bp(GC, n_chunks):
    return pl.BlockSpec((1, 2, GC), lambda i, *_: (i // n_chunks, 0, 0),
                        memory_space=pltpu.VMEM)


def _res_bp(shape):
    return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _prep_bp(params, bias, dp, B: int, C: int, cross: bool):
    """One-shot operand prep shared by fwd and bwd: expanded block-diagonal
    params (G-sized), lane-tiled bias plane, group-major lane DropPath
    scales (ngroups, 2, G*C). Computed ONCE per block call in the
    custom-VJP fwd and threaded to the bwd via residuals (the bwd used to
    re-run the whole kron-expansion op chain — a measured part of the
    scan-body operand-prep tail, ROADMAP round-3 attribution).

    HBM cost of pinning the expansions fwd->bwd (round-3 advisor note): at
    the flagship geometry (G=8, C=12 -> BC=96, Ch=48) the kron matrices are
    (96,96)/(96,384)/(384,96) f32 — ~0.6 MB per block including the lane
    tiles, ~40 MB across all ~60 scanned blocks, under 0.3% of v5e HBM and
    far below the streams the blocks already save (x2r is ~30 MB/block).
    Recomputing in bwd would instead re-pay the einsum/tile op chain per
    block per step; the pin stays."""
    G = group_size(B)
    ngroups = B // G
    bp_params = _expand_params(params, G, cross)
    dpl = jnp.repeat(jnp.asarray(dp, jnp.float32).T, C, axis=1)  # (2, B*C)
    dpl = jnp.transpose(dpl.reshape(2, ngroups, G * C), (1, 0, 2))
    bias_bp = jnp.tile(jnp.asarray(bias, jnp.float32), (1, G))
    return bp_params, bias_bp, dpl


def _fwd_impl_bp(x, y, params, bias, mask, dp, seed_arr, rates, training,
                 interpret, cross, prep=None):
    B = dp.shape[0]
    ngroups, grouped = _stream_geom(x, B)
    nW, NP = x.shape[-3], x.shape[-2]
    C = x.shape[-1] * (ngroups if grouped else 1) // B
    G = B // ngroups
    BC = G * C                                     # per-group lane width
    H = bias.shape[1] // NP
    BH = G * H
    L = BH * NP
    Ch = params[-4].shape[1]
    mode = _mode_for(interpret)
    mm16 = _MM16_ENABLED and x.dtype == jnp.bfloat16
    Wc, _ = _grid_chunk(nW, NP, BC, L, mode)
    n_chunks = nW // Wc
    with_mask = mask is not None
    dims = (Wc, NP, BC, BH, G * Ch, n_chunks)
    bp_params, bias_bp, dpl = (prep if prep is not None
                               else _prep_bp(params, bias, dp, B, C, cross))
    x4 = x if grouped else _to_groups(x, ngroups)

    x_spec = _x_spec_bp(Wc, NP, BC, n_chunks)
    in_specs = [x_spec]
    if cross:
        in_specs.append(x_spec)
    in_specs += [_dpl_spec_bp(BC, n_chunks), _res_bp((NP, L))]
    if with_mask:
        in_specs.append(_mask_spec_bp(Wc, NP, n_chunks))
    in_specs += [_res_bp(p.shape) for p in bp_params]
    y4 = (jnp.asarray(y, x.dtype) if grouped
          else _to_groups(jnp.asarray(y, x.dtype), ngroups)) if cross else None
    args = ((seed_arr, x4)
            + ((y4,) if cross else ())
            + (dpl, bias_bp)
            + ((jnp.asarray(mask, jnp.float32),) if with_mask else ())
            + bp_params)
    out4, x2r4 = pl.pallas_call(
        _make_fwd_kernel_bp(dims, rates, training, with_mask, cross, mode,
                            mm16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ngroups * n_chunks,),
            in_specs=in_specs, out_specs=[x_spec, x_spec]),
        out_shape=[jax.ShapeDtypeStruct(x4.shape, x.dtype)] * 2,
        interpret=interpret,
        compiler_params=fb._compiler_params(),
    )(*args)
    if grouped:
        return out4, x2r4
    return _from_groups(out4), _from_groups(x2r4)


def _bwd_impl_bp(x, y, params, bias, mask, dp, seed_arr, x2r, g, rates,
                 training, interpret, cross, prep=None):
    B = dp.shape[0]
    ngroups, grouped = _stream_geom(x, B)
    nW, NP = x.shape[-3], x.shape[-2]
    C = x.shape[-1] * (ngroups if grouped else 1) // B
    G = B // ngroups
    BC = G * C                                     # per-group lane width
    H = bias.shape[1] // NP
    BH = G * H
    L = BH * NP
    Ch = params[-4].shape[1]
    mode = _mode_for(interpret)
    mm16 = _MM16_ENABLED and x.dtype == jnp.bfloat16
    _, Wc = _grid_chunk(nW, NP, BC, L, mode)
    n_chunks = nW // Wc
    with_mask = mask is not None
    dims = (Wc, NP, BC, BH, G * Ch, n_chunks)
    bp_params, bias_bp, dpl = (prep if prep is not None
                               else _prep_bp(params, bias, dp, B, C, cross))
    g_shapes = _bp_grad_shapes(G, C, Ch, cross)

    def to4(t):
        t = jnp.asarray(t, x.dtype)
        return t if grouped else _to_groups(t, ngroups)

    x_spec = _x_spec_bp(Wc, NP, BC, n_chunks)
    in_specs = [x_spec]
    if cross:
        in_specs.append(x_spec)
    in_specs += [x_spec, x_spec, _dpl_spec_bp(BC, n_chunks),
                 _res_bp((NP, L))]
    if with_mask:
        in_specs.append(_mask_spec_bp(Wc, NP, n_chunks))
    in_specs += [_res_bp(p.shape) for p in bp_params]
    out_specs = ([x_spec] + ([x_spec] if cross else [])
                 + [_res_bp((NP, L))] + [_res_bp(s) for s in g_shapes])
    x4 = x if grouped else _to_groups(x, ngroups)
    out_shapes = ([jax.ShapeDtypeStruct(x4.shape, x.dtype)]
                  * (2 if cross else 1)
                  + [jax.ShapeDtypeStruct((NP, L), jnp.float32)]
                  + [jax.ShapeDtypeStruct(s, jnp.float32)
                     for s in g_shapes])
    args = ((seed_arr, x4)
            + ((to4(y),) if cross else ())
            + (to4(x2r), to4(g), dpl, bias_bp)
            + ((jnp.asarray(mask, jnp.float32),) if with_mask else ())
            + bp_params)
    outs = pl.pallas_call(
        _make_bwd_kernel_bp(dims, rates, training, with_mask, cross, mode,
                            mm16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ngroups * n_chunks,),
            in_specs=in_specs, out_specs=out_specs),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=fb._compiler_params(),
    )(*args)
    back = (lambda t: t) if grouped else _from_groups
    if cross:
        dx, dy, dbias_bp = back(outs[0]), back(outs[1]), outs[2]
        d_bp = outs[3:]
    else:
        dx, dbias_bp = back(outs[0]), outs[1]
        dy = None
        d_bp = outs[2:]
    dparams = tuple(d.astype(jnp.asarray(p).dtype)
                    for d, p in zip(_fold_grads(d_bp, G, cross), params))
    dbias = dbias_bp.reshape(NP, G, H * NP).sum(1).astype(
        jnp.asarray(bias).dtype)
    return dx, dy, dparams, dbias


# ---------------------------------------------------------------------------
# custom-VJP entry points (same contracts as fusion_block.py, BP layout)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_fusion_block_bp(x, params, bias, mask, dp, seed,
                          rates: Tuple[float, float], training: bool,
                          interpret: bool = False):
    """Self-attention SwinFusion block in batch-lane-packed layout.

    x: (nW, NP, B*C) — lane l = b*C + c — or group-major 4-D
    (ngroups, nW, NP, G*C) with G = group_size(B) (round-5 glue: the
    stacks keep their streams group-major so the lane-split transpose is
    paid per stack, not per kernel call; output layout follows the input).
    params: the SAME 12-tuple as fused_fusion_block. bias: head-packed
    (NP, H*NP). mask: optional (nW, NP, NP). dp: (B, 2) per-sample DropPath
    scales. Gradients match fused_fusion_block exactly (deterministic
    mode)."""
    return _ffb_bp_fwd(x, params, bias, mask, dp, seed, rates, training,
                       interpret)[0]


def _public_C(x, B: int) -> int:
    ngroups, grouped = _stream_geom(x, B)
    return x.shape[-1] * (ngroups if grouped else 1) // B


def _ffb_bp_fwd(x, params, bias, mask, dp, seed, rates, training, interpret):
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    B = dp.shape[0]
    prep = _prep_bp(params, bias, dp, B, _public_C(x, B), cross=False)
    out, x2r = _fwd_impl_bp(x, None, params, bias, mask, dp, seed_arr,
                            rates, training, interpret, cross=False,
                            prep=prep)
    return out, (x, params, bias, mask, dp, seed_arr, x2r, prep)


def _ffb_bp_bwd(rates, training, interpret, res, g):
    x, params, bias, mask, dp, seed_arr, x2r, prep = res
    dx, _, dparams, dbias = _bwd_impl_bp(x, None, params, bias, mask, dp,
                                         seed_arr, x2r, g, rates, training,
                                         interpret, cross=False, prep=prep)
    return (dx.astype(x.dtype), dparams, dbias, None, None, None)


fused_fusion_block_bp.defvjp(_ffb_bp_fwd, _ffb_bp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_cross_fusion_block_bp(x, y, params, bias, mask, dp, seed,
                                rates: Tuple[float, float], training: bool,
                                interpret: bool = False):
    """Directed cross-attention half-block (q from x, k/v from y) in BP
    layout (3-D public or group-major 4-D streams, like
    fused_fusion_block_bp); params: the SAME 16-tuple as
    fused_cross_fusion_block."""
    return _fcb_bp_fwd(x, y, params, bias, mask, dp, seed, rates, training,
                       interpret)[0]


def _fcb_bp_fwd(x, y, params, bias, mask, dp, seed, rates, training,
                interpret):
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    B = dp.shape[0]
    prep = _prep_bp(params, bias, dp, B, _public_C(x, B), cross=True)
    out, x2r = _fwd_impl_bp(x, y, params, bias, mask, dp, seed_arr, rates,
                            training, interpret, cross=True, prep=prep)
    return out, (x, y, params, bias, mask, dp, seed_arr, x2r, prep)


def _fcb_bp_bwd(rates, training, interpret, res, g):
    x, y, params, bias, mask, dp, seed_arr, x2r, prep = res
    dx, dy, dparams, dbias = _bwd_impl_bp(x, y, params, bias, mask, dp,
                                          seed_arr, x2r, g, rates, training,
                                          interpret, cross=True, prep=prep)
    return (dx.astype(x.dtype), dy.astype(y.dtype), dparams, dbias,
            None, None, None)


fused_cross_fusion_block_bp.defvjp(_fcb_bp_fwd, _fcb_bp_bwd)
