"""Pallas fused multi-head attention (TPU).

Motivation (SURVEY §7.2 step 9): the temporal-BERT hot loop
(reference model.py:154-192; ours nn/bert.py) runs T=369 tokens at
head_dim=7 — the (B, H, T, T) probability tensor is ~52 MB per layer and,
under plain XLA, round-trips HBM twice in the forward and more in the
backward across 32 encoder layers. Sequence length and head count are small
enough that a whole (T, T) score matrix fits VMEM, so this kernel computes
softmax(q k^T * scale [+ bias]) v per (batch, head) grid cell without ever
materializing probabilities in HBM. The backward pass recomputes
probabilities in-kernel (flash-attention style dq/dk/dv formulas) via a
custom VJP.

Used by the nn layers when ``use_pallas_attention`` is on and the default
backend is TPU; everywhere else the plain einsum path runs (CPU tests
exercise this kernel in interpreter mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_neuroimage_tpu.ops.fusion_block import _compiler_params


def _softmax_p(q, k):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _drop_mask(shape, dropout_rate: float):
    """Counter-based keep mask from the per-program PRNG (seeded by caller).
    Threshold in uint32 space: keep iff bits >= rate * 2^32."""
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(min(int(dropout_rate * (2 ** 32)), 2 ** 32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _seed_prng(seed_ref):
    b, h = pl.program_id(0), pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] * 65537 + b * pl.num_programs(1) + h)


def _make_fwd_kernel(dropout_rate: float):
    def kernel(seed_ref, q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        p = _softmax_p(q, k)
        if dropout_rate > 0.0:
            _seed_prng(seed_ref)
            keep = _drop_mask(p.shape, dropout_rate)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        o_ref[0, 0] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
    return kernel


def _make_bwd_kernel(dropout_rate: float):
    def kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
               dq_ref, dk_ref, dv_ref):
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        p = _softmax_p(q, k)
        if dropout_rate > 0.0:
            _seed_prng(seed_ref)  # same stream as forward -> same mask
            keep = _drop_mask(p.shape, dropout_rate)
            p_d = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            p_d = p
        # dv = p_d^T do ; g_p = mask(do v^T) ; ds = p*(g_p - rowsum(g_p*p))
        dv = jax.lax.dot_general(p_d, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g_pd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            g_p = jnp.where(keep, g_pd / (1.0 - dropout_rate), 0.0)
        else:
            g_p = g_pd
        ds = p * (g_p - jnp.sum(g_p * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, 0] = dq.astype(dq_ref.dtype)
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    return kernel


def _bh_spec(T: int, D: int):
    # index_map gets the scalar-prefetch ref appended under
    # PrefetchScalarGridSpec — accept and ignore it
    return pl.BlockSpec((1, 1, T, D), lambda b, h, *_: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    seed: jnp.ndarray, dropout_rate: float = 0.0,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T) v with optional fused probability dropout.

    q, k, v: (B, H, T, D); queries are expected pre-scaled (callers multiply
    by 1/sqrt(D) or the learned scale beforehand). ``seed`` is a scalar int32
    used for the counter-based in-kernel dropout PRNG (ignored when
    ``dropout_rate == 0``). Returns (B, H, T, D) in q's dtype with fp32
    internal math; probabilities never touch HBM.
    """
    return _fused_fwd(q, k, v, seed, dropout_rate, interpret)[0]


def _pallas_grid_spec(B, H, T, D, n_tensors):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[_bh_spec(T, D)] * n_tensors,
        out_specs=_bh_spec(T, D),
    )


def _fused_fwd(q, k, v, seed, dropout_rate, interpret):
    B, H, T, D = q.shape
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    out = pl.pallas_call(
        _make_fwd_kernel(dropout_rate),
        grid_spec=_pallas_grid_spec(B, H, T, D, 3),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        # shared 64 MB scoped-vmem cap (see fusion_block): the default
        # 16 MB Mosaic budget is close to these kernels' live set and a
        # silent compile-failure fallback cost round 2 a plan (ADVICE r2)
        compiler_params=_compiler_params(),
    )(seed_arr, q, k, v)
    return out, (q, k, v, seed_arr)


def _fused_bwd(dropout_rate, interpret, res, g):
    q, k, v, seed_arr = res
    B, H, T, D = q.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[_bh_spec(T, D)] * 4,
        out_specs=[_bh_spec(T, D)] * 3,
    )
    dq, dk, dv = pl.pallas_call(
        _make_bwd_kernel(dropout_rate),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
        # shared 64 MB scoped-vmem cap (see fusion_block): the default
        # 16 MB Mosaic budget is close to these kernels' live set and a
        # silent compile-failure fallback cost round 2 a plan (ADVICE r2)
        compiler_params=_compiler_params(),
    )(seed_arr, q, k, v, g)
    return dq, dk, dv, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)


def attention_reference(q, k, v):
    """Plain einsum path (what XLA runs without the kernel)."""
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def fused_window_attention(q, k, v, bias, mask=None, seed=0,
                           dropout_rate: float = 0.0,
                           interpret: bool = False):
    """Window attention via the fused kernel.

    q, k, v: (B, nW, H, N, D) pre-scaled; bias: (H, N, N) relative position
    bias; mask: optional (nW, N, N) additive shift mask. Folds bias/mask into
    k-space? No — bias depends on both tokens, so it is added to the scores:
    we absorb it by augmenting the kernel inputs instead. Simpler and exact:
    fold (B, nW) into the batch axis and call a bias-aware variant.
    """
    B, nW, H, N, D = q.shape

    def fold(t):
        return t.reshape(B * nW, H, N, D)

    out = _fused_attention_bias(
        fold(q), fold(k), fold(v), bias.astype(jnp.float32),
        (None if mask is None
         else jnp.asarray(mask, jnp.float32)), nW,
        jnp.asarray(seed, jnp.int32), dropout_rate, interpret)
    return out.reshape(B, nW, H, N, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 7, 8))
def _fused_attention_bias(q, k, v, bias, mask, n_windows, seed,
                          dropout_rate, interpret):
    return _fab_fwd(q, k, v, bias, mask, n_windows, seed, dropout_rate,
                    interpret)[0]


def _fab_specs(T, D, H, n_windows, with_mask):
    # grid is (H, B): heads outer so the per-head bias(+grad) block stays
    # resident across the inner batch sweep (consecutive revisits)
    qspec = pl.BlockSpec((1, 1, T, D), lambda h, b, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, T, T), lambda h, b, *_: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    specs = [qspec, qspec, qspec, bias_spec]
    if with_mask:
        specs.append(pl.BlockSpec(
            (1, T, T), lambda h, b, *_: (b % n_windows, 0, 0),
            memory_space=pltpu.VMEM))
    return specs


def _make_fab_kernels(dropout_rate: float, with_mask: bool, backward: bool):
    def score(q_ref, k_ref, bias_ref, mask_ref):
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[0]
        if mask_ref is not None:
            s = s + mask_ref[0]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        return e / jnp.sum(e, axis=-1, keepdims=True)

    if not backward:
        def fwd(seed_ref, q_ref, k_ref, v_ref, bias_ref, *rest):
            mask_ref = rest[0] if with_mask else None
            o_ref = rest[-1]
            p = score(q_ref, k_ref, bias_ref, mask_ref)
            if dropout_rate > 0.0:
                _seed_prng(seed_ref)
                keep = _drop_mask(p.shape, dropout_rate)
                p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            v = v_ref[0, 0].astype(jnp.float32)
            o_ref[0, 0] = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return fwd

    def bwd(seed_ref, q_ref, k_ref, v_ref, bias_ref, *rest):
        if with_mask:
            mask_ref, do_ref, dq_ref, dk_ref, dv_ref, db_ref = rest
        else:
            mask_ref = None
            do_ref, dq_ref, dk_ref, dv_ref, db_ref = rest
        p = score(q_ref, k_ref, bias_ref, mask_ref)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        if dropout_rate > 0.0:
            _seed_prng(seed_ref)
            keep = _drop_mask(p.shape, dropout_rate)
            p_d = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            p_d = p
        dv = jax.lax.dot_general(p_d, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g_pd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            g_p = jnp.where(keep, g_pd / (1.0 - dropout_rate), 0.0)
        else:
            g_p = g_pd
        ds = p * (g_p - jnp.sum(g_p * p, axis=-1, keepdims=True))
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        dq_ref[0, 0] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, 0] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)
        # accumulate bias grad over the inner (b) grid axis; the (h) block
        # stays resident, initialized at the first batch step
        @pl.when(pl.program_id(1) == 0)
        def _():
            db_ref[0] = jnp.zeros_like(db_ref[0])
        db_ref[0] += ds
    return bwd


def _fab_fwd(q, k, v, bias, mask, n_windows, seed, dropout_rate, interpret):
    B, H, T, D = q.shape
    with_mask = mask is not None
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    args = (seed_arr, q, k, v, bias) + ((mask,) if with_mask else ())
    out = pl.pallas_call(
        _make_fab_kernels(dropout_rate, with_mask, backward=False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(H, B),
            in_specs=_fab_specs(T, D, H, n_windows, with_mask),
            out_specs=pl.BlockSpec((1, 1, T, D), lambda h, b, *_: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        # shared 64 MB scoped-vmem cap (see fusion_block): the default
        # 16 MB Mosaic budget is close to these kernels' live set and a
        # silent compile-failure fallback cost round 2 a plan (ADVICE r2)
        compiler_params=_compiler_params(),
    )(*args)
    return out, (q, k, v, bias, mask, seed_arr)


def _fab_bwd(n_windows, dropout_rate, interpret, res, g):
    q, k, v, bias, mask, seed_arr = res
    B, H, T, D = q.shape
    with_mask = mask is not None
    qspec = pl.BlockSpec((1, 1, T, D), lambda h, b, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bias_out_spec = pl.BlockSpec((1, T, T), lambda h, b, *_: (h, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = _fab_specs(T, D, H, n_windows, with_mask) + [qspec]
    args = (seed_arr, q, k, v, bias) + ((mask,) if with_mask else ()) + (g,)
    dq, dk, dv, dbias = pl.pallas_call(
        _make_fab_kernels(dropout_rate, with_mask, backward=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(H, B),
            in_specs=in_specs,
            out_specs=[qspec, qspec, qspec, bias_out_spec]),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3
        + [jax.ShapeDtypeStruct(bias.shape, jnp.float32)],
        interpret=interpret,
        # shared 64 MB scoped-vmem cap (see fusion_block): the default
        # 16 MB Mosaic budget is close to these kernels' live set and a
        # silent compile-failure fallback cost round 2 a plan (ADVICE r2)
        compiler_params=_compiler_params(),
    )(*args)
    dmask = None
    return dq, dk, dv, dbias.astype(bias.dtype), dmask, None


_fused_attention_bias.defvjp(_fab_fwd, _fab_bwd)


_FORCED: Optional[bool] = None


def set_fused_attention(enabled: Optional[bool]) -> None:
    """Force the fused kernel on/off (None = auto: TPU only)."""
    global _FORCED
    _FORCED = enabled


def fused_attention_active() -> bool:
    if _FORCED is not None:
        return _FORCED
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
