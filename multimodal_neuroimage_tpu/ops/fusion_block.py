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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6
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
    retained for call-site compatibility but no longer used."""
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    h = (seed_ref[0] * jnp.int32(-1640531527)        # 0x9E3779B9 (golden)
         ^ (cell + jnp.int32(1)) * jnp.int32(461845907)
         ^ jnp.int32(draw + 1) * jnp.int32(-862048943))
    pltpu.prng_seed(h)


def _keep_scale(shape, rate: float):
    """Multiplicative dropout factor: 1/(1-rate) where kept, else 0."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thr = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return jnp.where(bits >= thr, 1.0 / (1.0 - rate), 0.0)


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


_GELU_A = 0.7978845608028654      # sqrt(2/pi)
_GELU_B = 0.044715


def _gelu(u):
    return 0.5 * u * (1.0 + jnp.tanh(_GELU_A * (u + _GELU_B * u * u * u)))


def _gelu_grad(u):
    t = jnp.tanh(_GELU_A * (u + _GELU_B * u * u * u))
    return (0.5 * (1.0 + t)
            + 0.5 * u * (1.0 - t * t) * _GELU_A * (1.0 + 3.0 * _GELU_B * u * u))


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


def _attn_fwd_head(q3, k3, v3, bias_ref, mask_ref, h, hd, scale,
                   attn_rate, seed_ref, n_draws, training):
    qh = q3[:, :, h * hd:(h + 1) * hd] * scale
    kh = k3[:, :, h * hd:(h + 1) * hd]
    vh = v3[:, :, h * hd:(h + 1) * hd]
    s = _bdot(qh, kh, 2, 2)                       # (Wc, NP, NP)
    s = s + bias_ref[h]
    if mask_ref is not None:
        s = s + mask_ref[:]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if training and attn_rate > 0.0:
        _seed_draw(seed_ref, 3 + h, n_draws)
        pd = p * _keep_scale(p.shape, attn_rate)
    else:
        pd = p
    return qh, kh, vh, p, pd, _bdot(pd, vh, 2, 1)  # o_h (Wc, NP, hd)


def _forward_compute(seed_ref, x_ref, y_ref, dp_ref, bias_ref, mask_ref,
                     prefs, dims, rates, training, o_scratch, cross,
                     p_scratch=None):
    """Shared forward used by both kernels. Returns out plus residuals."""
    Wc, NP, C, H, Ch = dims
    attn_rate, drop_rate = rates
    hd = C // H
    scale = hd ** -0.5
    R = Wc * NP
    n_draws = 3 + H

    if cross:
        (g1, b1, g1y, b1y, wq, bq, wkv, bkv,
         wp, bp, g2, b2, w1, b1m, w2, b2m) = prefs
    else:
        (g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, b1m, w2, b2m) = prefs

    x = x_ref[0].astype(jnp.float32)              # (Wc, NP, C)
    x2 = x.reshape(R, C)
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

    for h in range(H):
        _, _, _, p_h, _, oh = _attn_fwd_head(
            q3, k3, v3, bias_ref, mask_ref, h, hd, scale,
            attn_rate, seed_ref, n_draws, training)
        o_scratch[:, :, h * hd:(h + 1) * hd] = oh
        if p_scratch is not None:
            p_scratch[h] = p_h      # backward reuses softmax output
    o = o_scratch[:]
    o2 = o.reshape(R, C)
    a = _dot(o2, wp[:]) + bp[:]
    if training and drop_rate > 0.0:
        _seed_draw(seed_ref, _DRAW_PROJ, n_draws)
        mp = _keep_scale(a.shape, drop_rate)
        a = a * mp
    else:
        mp = None
    dp1 = dp_ref[pl.program_id(0), 0]
    dp2 = dp_ref[pl.program_id(0), 1]
    x2r = x2 + dp1 * a
    h2, xh2, r2 = _ln_fwd(x2r, g2[:], b2[:])
    u = _dot(h2, w1[:]) + b1m[:]
    gu = _gelu(u)
    if training and drop_rate > 0.0:
        _seed_draw(seed_ref, _DRAW_MLP1, n_draws)
        m1 = _keep_scale(gu.shape, drop_rate)
        gu = gu * m1
    else:
        m1 = None
    z = _dot(gu, w2[:]) + b2m[:]
    if training and drop_rate > 0.0:
        _seed_draw(seed_ref, _DRAW_MLP2, n_draws)
        m2 = _keep_scale(z.shape, drop_rate)
        z = z * m2
    else:
        m2 = None
    out = x2r + dp2 * z
    residuals = (x2, h1, xh1, r1, h1y, xh1y, r1y, q3, k3, v3, o2, mp,
                 dp1, dp2, x2r, h2, xh2, r2, u, gu, m1, m2)
    return out, residuals


def _make_fwd_kernel(dims, rates, training, with_mask, cross):
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
        o_ref, o_scratch = rest[-2], rest[-1]
        out, _ = _forward_compute(seed_ref, x_ref, y_ref, dp_ref, bias_ref,
                                  mask_ref, prefs, dims, rates, training,
                                  o_scratch, cross)
        Wc, NP, C = dims[0], dims[1], dims[2]
        o_ref[0] = out.reshape(Wc, NP, C).astype(o_ref.dtype)
    return kernel


def _make_bwd_kernel(dims, rates, training, with_mask, cross):
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
        g_ref = rest[i + np_]
        outs = rest[i + np_ + 1:]
        if cross:
            dx_ref, dy_ref, dbias_ref = outs[0], outs[1], outs[2]
            dp_refs = outs[3:3 + np_]
            (o_scratch, dq_scratch, dkv_scratch,
             p_scratch) = outs[-4], outs[-3], outs[-2], outs[-1]
            (dg1_ref, db1_ref, dg1y_ref, db1y_ref, dwq_ref, dbq_ref,
             dwkv_ref, dbkv_ref, dwp_ref, dbp_ref, dg2_ref, db2_ref,
             dw1_ref, db1m_ref, dw2_ref, db2m_ref) = dp_refs
        else:
            dx_ref, dbias_ref = outs[0], outs[1]
            dp_refs = outs[2:2 + np_]
            o_scratch, dqkv_scratch, p_scratch = (outs[-3], outs[-2],
                                                  outs[-1])
            (dg1_ref, db1_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref,
             dg2_ref, db2_ref, dw1_ref, db1m_ref, dw2_ref, db2m_ref) = dp_refs

        Wc, NP, C, H, Ch = dims
        attn_rate, drop_rate = rates
        hd = C // H
        scale = hd ** -0.5
        R = Wc * NP

        _, res = _forward_compute(seed_ref, x_ref, y_ref, dp_ref, bias_ref,
                                  mask_ref, prefs, dims, rates, training,
                                  o_scratch, cross, p_scratch=p_scratch)
        # VMEM discipline: dropout masks (mp/m1/m2), gu, and every LN
        # statistic (h1/xh1/r1/h2/xh2/r2) are NOT kept from the recompute.
        # Per-draw PRNG seeding regenerates each mask at its use site, and
        # the LN stats are recomputed from x2/x2r (whose buffers are alive
        # anyway) — together ~5 MB off the live set, the margin that lets
        # the backward run at the forward's window-chunk size.
        (x2, _, _, _, _, _, _, q3, k3, v3, o2, _,
         dp1, dp2, x2r, _, _, _, _, _, _, _) = res
        n_draws = 3 + H
        if cross:
            (g1, b1, g1y, b1y, wq, bq, wkv, bkv,
             wp, bp, g2, b2, w1, b1m, w2, b2m) = prefs
        else:
            (g1, b1, wqkv, bqkv, wp, bp, g2, b2, w1, b1m, w2, b2m) = prefs

        is_first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0))

        @pl.when(is_first)
        def _():
            for ref in (dbias_ref,) + tuple(dp_refs):
                ref[:] = jnp.zeros_like(ref)

        g = g_ref[0].astype(jnp.float32).reshape(R, C)

        # ---- MLP / LN2 backward ---------------------------------------------
        with_drop = training and drop_rate > 0.0
        dz = dp2 * g
        if with_drop:
            _seed_draw(seed_ref, _DRAW_MLP2, n_draws)
            dz = dz * _keep_scale(dz.shape, drop_rate)
        db2m_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
        h2, xh2, r2 = _ln_fwd(x2r, g2[:], b2[:])
        u = _dot(h2, w1[:]) + b1m[:]
        gu = _gelu(u)
        if with_drop:
            _seed_draw(seed_ref, _DRAW_MLP1, n_draws)
            m1 = _keep_scale(gu.shape, drop_rate)
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

        # ---- proj backward ----------------------------------------------------
        da = dp1 * dx2r
        if with_drop:
            _seed_draw(seed_ref, _DRAW_PROJ, n_draws)
            da = da * _keep_scale(da.shape, drop_rate)
        dbp_ref[:] += jnp.sum(da, axis=0, keepdims=True)
        dwp_ref[:] += _dot_tn(o2, da)
        do2 = _dot_nt(da, wp[:])
        do3 = do2.reshape(Wc, NP, C)

        # ---- attention backward (recompute each head) --------------------------
        dq_sc = dq_scratch if cross else dqkv_scratch
        kv_sc = dkv_scratch if cross else dqkv_scratch
        kv_off = 0 if cross else C
        for h in range(H):
            # p saved from the recompute above — no second scores+softmax
            qh = q3[:, :, h * hd:(h + 1) * hd] * scale
            kh = k3[:, :, h * hd:(h + 1) * hd]
            vh = v3[:, :, h * hd:(h + 1) * hd]
            p = p_scratch[h]
            if training and attn_rate > 0.0:
                _seed_draw(seed_ref, 3 + h, 3 + H)
                pd = p * _keep_scale(p.shape, attn_rate)
            else:
                pd = p
            doh = do3[:, :, h * hd:(h + 1) * hd]
            dpd = _bdot(doh, vh, 2, 2)                         # (Wc,NP,NP)
            dvh = _bdot(pd, doh, 1, 1)                         # (Wc,NP,hd)
            if training and attn_rate > 0.0:
                _seed_draw(seed_ref, 3 + h, 3 + H)
                dp_ = dpd * _keep_scale(dpd.shape, attn_rate)
            else:
                dp_ = dpd
            ds = p * (dp_ - jnp.sum(dp_ * p, axis=-1, keepdims=True))
            dbias_ref[h] += jnp.sum(ds, axis=0)
            dq_sc[:, :, h * hd:(h + 1) * hd] = _bdot(ds, kh, 2, 1) * scale
            kv_sc[:, :, kv_off + h * hd:kv_off + (h + 1) * hd] = (
                _bdot(ds, qh, 1, 1))
            kv_sc[:, :, kv_off + C + h * hd:kv_off + C + (h + 1) * hd] = dvh

        h1, xh1, r1 = _ln_fwd(x2, g1[:], b1[:])
        if cross:
            dq = dq_scratch[:].reshape(R, C)
            dkv = dkv_scratch[:].reshape(R, 2 * C)
            dbq_ref[:] += jnp.sum(dq, axis=0, keepdims=True)
            dwq_ref[:] += _dot_tn(h1, dq)
            dh1 = _dot_nt(dq, wq[:])
            dbkv_ref[:] += jnp.sum(dkv, axis=0, keepdims=True)
            y2 = y_ref[0].astype(jnp.float32).reshape(R, C)
            h1y, xh1y, r1y = _ln_fwd(y2, g1y[:], b1y[:])
            dwkv_ref[:] += _dot_tn(h1y, dkv)
            dh1y = _dot_nt(dkv, wkv[:])
            dg1y_ref[:] += jnp.sum(dh1y * xh1y, axis=0, keepdims=True)
            db1y_ref[:] += jnp.sum(dh1y, axis=0, keepdims=True)
            dy = _ln_bwd(dh1y, xh1y, r1y, g1y[:])
            dy_ref[0] = dy.reshape(Wc, NP, C).astype(dy_ref.dtype)
        else:
            dqkv = dqkv_scratch[:].reshape(R, 3 * C)
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
              _resident((H, NP, NP))]
    if with_mask:
        specs.append(pl.BlockSpec((Wc, NP, NP), lambda b, c, *_: (c, 0, 0),
                                  memory_space=pltpu.VMEM))
    specs += [_resident(s) for s in p_shapes]
    return specs, x_spec


def _chunk_for(nW: int, NP: int, cross: bool) -> int:
    """ONE chunk size for forward AND backward — the grids must be identical
    or the per-(grid-cell, draw) PRNG seeding regenerates different dropout
    masks in the backward. Budget sized for the backward's larger live set
    (at the flagship geometry the backward peaks ~16.9 MB if given the
    forward-optimal chunk — 12 KB-to-1 MB over the 16 MB VMEM limit even
    after regenerating masks and LN stats at their use sites; per-window
    chunk-invariant mask draws would decouple the two, see ROADMAP)."""
    return pick_window_chunk(nW, NP, budget=(192 if cross else 320) * 1024)


def _fwd_impl(x, y, params, bias, mask, dp, seed, rates, training,
              interpret, cross):
    B, nW, NP, C = x.shape
    H = bias.shape[0]
    Ch = params[-4].shape[1]
    Wc = _chunk_for(nW, NP, cross)
    with_mask = mask is not None
    dims = (Wc, NP, C, H, Ch)
    p_shapes = param_shapes(C, Ch, cross)
    in_specs, x_spec = _in_specs(Wc, NP, C, H, with_mask, p_shapes, cross)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    args = ((seed_arr, f32(x)) + ((f32(y),) if cross else ())
            + (f32(dp), f32(bias))
            + ((f32(mask),) if with_mask else ())
            + tuple(f32(p) for p in params))
    out = pl.pallas_call(
        _make_fwd_kernel(dims, rates, training, with_mask, cross),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, nW // Wc),
            in_specs=in_specs, out_specs=x_spec,
            scratch_shapes=[pltpu.VMEM((Wc, NP, C), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=interpret,
    )(*args)
    return out.astype(x.dtype)


def _bwd_impl(x, y, params, bias, mask, dp, seed_arr, g, rates, training,
              interpret, cross):
    B, nW, NP, C = x.shape
    H = bias.shape[0]
    Ch = params[-4].shape[1]
    Wc = _chunk_for(nW, NP, cross)
    with_mask = mask is not None
    dims = (Wc, NP, C, H, Ch)
    p_shapes = param_shapes(C, Ch, cross)
    in_specs, x_spec = _in_specs(Wc, NP, C, H, with_mask, p_shapes, cross)
    in_specs.append(x_spec)                       # cotangent g
    out_specs = ([x_spec] + ([x_spec] if cross else [])
                 + [_resident((H, NP, NP))]
                 + [_resident(s) for s in p_shapes])
    out_shapes = ([jax.ShapeDtypeStruct(x.shape, jnp.float32)]
                  * (2 if cross else 1)
                  + [jax.ShapeDtypeStruct((H, NP, NP), jnp.float32)]
                  + [jax.ShapeDtypeStruct(s, jnp.float32)
                     for s in p_shapes])
    scratch = ([pltpu.VMEM((Wc, NP, C), jnp.float32)]
               + ([pltpu.VMEM((Wc, NP, C), jnp.float32),
                   pltpu.VMEM((Wc, NP, 2 * C), jnp.float32)] if cross
                  else [pltpu.VMEM((Wc, NP, 3 * C), jnp.float32)])
               + [pltpu.VMEM((H, Wc, NP, NP), jnp.float32)])
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    args = ((seed_arr, f32(x)) + ((f32(y),) if cross else ())
            + (f32(dp), f32(bias))
            + ((f32(mask),) if with_mask else ())
            + tuple(f32(p) for p in params) + (f32(g),))
    outs = pl.pallas_call(
        _make_bwd_kernel(dims, rates, training, with_mask, cross),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, nW // Wc),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch),
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    if cross:
        dx, dy, dbias = outs[0], outs[1], outs[2]
        dparams = tuple(d.astype(jnp.asarray(p).dtype)
                        for d, p in zip(outs[3:], params))
        return dx, dy, dparams, dbias
    dx, dbias = outs[0], outs[1]
    dparams = tuple(d.astype(jnp.asarray(p).dtype)
                    for d, p in zip(outs[2:], params))
    return dx, None, dparams, dbias


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
    out = _fwd_impl(x, None, params, bias, mask, dp, seed_arr, rates,
                    training, interpret, cross=False)
    return out, (x, params, bias, mask, dp, seed_arr)


def _ffb_bwd(rates, training, interpret, res, g):
    x, params, bias, mask, dp, seed_arr = res
    dx, _, dparams, dbias = _bwd_impl(x, None, params, bias, mask, dp,
                                      seed_arr, g, rates, training,
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
    out = _fwd_impl(x, y, params, bias, mask, dp, seed_arr, rates,
                    training, interpret, cross=True)
    return out, (x, y, params, bias, mask, dp, seed_arr)


def _fcb_bwd(rates, training, interpret, res, g):
    x, y, params, bias, mask, dp, seed_arr = res
    dx, dy, dparams, dbias = _bwd_impl(x, y, params, bias, mask, dp,
                                       seed_arr, g, rates, training,
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
