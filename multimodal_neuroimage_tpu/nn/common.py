"""Shared NN building blocks (flax.linen)."""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
xavier_uniform_init = nn.initializers.xavier_uniform()


class TorchConv(nn.Module):
    """Conv with PyTorch's default initialization: kaiming-uniform(a=sqrt(5))
    kernel and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias.

    flax's zero bias default left the SwinFusion conv stems emitting EXACT
    zeros on the zero off-diagonal region of the diagonal-embedded fMRI
    matrix (model.py:1977-1989): every downstream LayerNorm then sees
    variance 0 and scales backward cotangents by 1/sqrt(eps) (~1e3); ~24
    stacked LNs overflow f32 and NaN the gradients. Nonzero bias (the
    reference's torch behavior) breaks the exact-zero plateau at the source.
    """

    features: int
    kernel_size: tuple
    padding: Any = 1

    @nn.compact
    def __call__(self, x):
        fan_in = int(np.prod(self.kernel_size)) * x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in)
        return nn.Conv(
            self.features, self.kernel_size, padding=self.padding,
            kernel_init=nn.initializers.variance_scaling(
                1.0 / 3.0, "fan_in", "uniform"),
            bias_init=lambda key, shape, dtype=jnp.float32:
                jax.random.uniform(key, shape, dtype, -bound, bound),
            name="conv")(x)


_SCAN_REMAT: Any = False


def set_scan_remat(enabled) -> None:
    """Opt-in rematerialization of scanned block bodies (recompute-in-backward).

    ``enabled`` may be True (remat every scanned stack), False, or a set of
    tags (e.g. {"bert"}) to remat only the tagged stacks. Full remat measured
    ~40x slower per step on the axon-tunneled v5e (recompute kernels dominate
    there), so it is OFF by default; BERT-only remat frees the dominant
    (B, T, 3072) FFN residuals at ~MXU-bound recompute cost."""
    global _SCAN_REMAT
    _SCAN_REMAT = enabled


def scan_body(body_cls, static_argnums, tag: str = ""):
    """Scan body, optionally remat-wrapped (see set_scan_remat)."""
    if _SCAN_REMAT is True or (isinstance(_SCAN_REMAT, (set, frozenset))
                               and tag in _SCAN_REMAT):
        return nn.remat(body_cls, static_argnums=static_argnums)
    return body_cls


def LayerNorm(**kwargs) -> nn.LayerNorm:
    """LayerNorm with the exact two-pass variance.

    flax's default fast variance (E[x^2] - E[x]^2) cancels catastrophically
    on near-constant activations — on TPU the computed variance can go below
    -eps, and sqrt(negative) NaNs the backward. The diagonal-embedded fMRI
    matrices (model.py:1977-1989) produce exactly such constant token
    features after the SwinFusion conv stems, which is where this bit us
    (patch_norm_A gradient NaN at full size).

    Default epsilon is torch's 1e-5 (flax defaults to 1e-6) — the reference
    Swin/fusion stacks all run torch nn.LayerNorm defaults, and the mismatch
    shows up at the 1e-3 level on low-variance activations (caught by
    tests/test_swin_golden.py). BERT paths pass their own HF eps (1e-12)."""
    kwargs.setdefault("use_fast_variance", False)
    kwargs.setdefault("epsilon", 1e-5)
    return nn.LayerNorm(**kwargs)


def leaky_relu(x, negative_slope: float = 0.01):
    return jax.nn.leaky_relu(x, negative_slope)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath semantics, used throughout
    the reference's Swin stacks — swin_v2_module.py:239).

    ``rate`` may be overridden per call with a traced scalar so stacked
    blocks under ``nn.scan`` can carry per-depth schedules."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        if deterministic or (rate is None and self.rate == 0.0):
            return x
        r = self.rate if rate is None else rate
        keep = 1.0 - r
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def gelu_exact(x):
    """Exact (erf) GELU — torch nn.GELU default (swin_v2_module.py:22).
    flax nn.gelu defaults to the tanh approximation, which diverges from the
    reference at the 1e-3 level."""
    return nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """fc1 -> act -> drop -> fc2 -> drop (swin_v2_module.py:16-32)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu_exact
    drop: float = 0.0
    kernel_init: Callable = trunc_normal_init

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, kernel_init=self.kernel_init)(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out, kernel_init=self.kernel_init)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nWindows, ws*ws, C): pure reshape/transpose, which
    XLA folds into the surrounding ops (replaces swin_v2_module.py:35-46).

    Keeping the batch dim separate (instead of the reference's nW*B fold)
    preserves a clean batch axis for data-parallel sharding.
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, (H // ws) * (W // ws), ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B, nWindows, ws*ws, C) -> (B, H, W, C) (swin_v2_module.py:49-62)."""
    B = windows.shape[0]
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def window_perm_indices(H: int, W: int, ws: int, shift: int, NP: int):
    """Static index planes for PERMUTATION-based inter-block glue.

    The fused-block entry chain — reshape -> roll(-shift) -> window_partition
    -> pad(N -> NP) — is a fixed bijection of the H*W valid tokens plus pad
    rows; so is the exit chain. Each can therefore run as ONE gather instead
    of a roll/transpose/pad kernel chain (the per-block XLA glue was a
    measured cost on the dispatch-heavy tunneled backend).

    Returns (entry, exit):
      entry: (nW*NP,) int32 — row t' of the flattened padded-window layout
        reads flat token entry[t'] of the (H*W) token-major layout. Pad rows
        (n >= ws*ws) read token 0: unlike the jnp.pad path they carry
        token-0 values instead of zeros, which the kernels never let reach a
        valid output (pad keys are bias-masked, pad rows are sliced/zero-
        cotangent on exit — ops/fusion_block.py docstring).
      exit:  (H*W,) int32 — flat token t reads row exit[t] of the padded-
        window layout.
    """
    N = ws * ws
    nW = (H // ws) * (W // ws)
    img = np.arange(H * W, dtype=np.int32).reshape(H, W)
    if shift:
        img = np.roll(img, (-shift, -shift), axis=(0, 1))
    wins = (img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
            .reshape(nW, N))
    entry = np.zeros((nW, NP), np.int32)
    entry[:, :N] = wins
    rows = (np.arange(nW, dtype=np.int32)[:, None] * NP
            + np.arange(N, dtype=np.int32)[None, :])
    exit_ = np.empty(H * W, np.int32)
    exit_[wins.reshape(-1)] = rows.reshape(-1)
    return entry.reshape(-1), exit_


@functools.lru_cache(maxsize=None)
def transition_permutation_fn(H: int, W: int, ws: int, s_from: int,
                              s_to: int, NP: int, axis: int = 0):
    """Window-resident block transition as a BIJECTION with a gather-only
    VJP.

    :func:`window_transition_indices` maps pad rows to the row holding flat
    token 0, so its autodiff transpose is a scatter-ADD (the jaxpr census
    counted 104 of them per flagship step — one per bpr block transition
    fwd+bwd). Here pad rows map to THEMSELVES instead, making the index a
    full permutation of the nW*NP rows, and the returned function carries a
    custom VJP that applies the inverse permutation — both directions are
    single static gathers; no scatter anywhere.

    Semantics vs the token-0 convention: pad-row VALUES now carry the
    previous block's pad-row outputs instead of token-0 copies. The fused
    kernels only require pad rows to be finite (pad keys are bias-masked
    out of every softmax; pad rows never reach a valid output), and
    row-wise LN keeps them bounded across a stack. Gradients are identical:
    pad-row cotangents are zero throughout a resident stack (pad rows
    influence no valid output, and the stack exit slices them away), which
    is the same invariant the scatter-add path needed to keep token-0's
    gradient unpolluted.

    lru_cached per geometry so the custom_vjp identity is stable across
    scan traces (one primitive per geometry, not per call site).

    ``axis`` selects which axis holds the nW*NP rows (axis=1 serves the
    group-major (ngroups, nW*NP, G*C) resident streams without a transpose).
    """
    N = ws * ws
    base = np.asarray(
        window_transition_indices(H, W, ws, s_from, s_to, NP)).copy()
    rows = np.arange(base.shape[0], dtype=np.int32)
    pad = (rows % NP) >= N
    base[pad] = rows[pad]                      # self-map pads -> bijection
    inv = np.argsort(base).astype(np.int32)
    # The cached closure holds NUMPY index planes and converts at USE time:
    # a jnp array created while a jit trace is active is trace-bound on
    # jax 0.9, and caching one leaks it into later traces ("No constant
    # handler for DynamicJaxprTracer" at scan lowering — round-5 bpr race
    # regression, reproduced: bpr traced after any other layout in one
    # process). jnp.take accepts numpy indices, materializing a fresh
    # constant under whatever trace is live.

    @jax.custom_vjp
    def permute(x):
        return jnp.take(x, base, axis=axis)

    def fwd(x):
        return permute(x), None

    def bwd(_, g):
        return (jnp.take(g, inv, axis=axis),)

    permute.defvjp(fwd, bwd)
    return permute


@functools.lru_cache(maxsize=None)
def window_transition_indices(H: int, W: int, ws: int, s_from: int,
                              s_to: int, NP: int):
    """COMPOSED inter-block glue: padded-window layout at shift
    ``s_from`` -> padded-window layout at shift ``s_to`` as ONE gather.

    Equivalent to ``entry(s_to) ∘ exit(s_from)`` from
    :func:`window_perm_indices`, i.e. reverse-windows -> unshift -> reshift
    -> re-window collapsed into a single static index plane. Lets a stack of
    alternating-shift blocks keep its stream window-resident: one gather per
    block transition instead of an exit + entry pair.

    Returns (nW*NP,) int32: row r of the shift-``s_to`` layout reads row
    ``t[r]`` of the shift-``s_from`` layout. Pad rows read the row holding
    flat token 0 (same convention as window_perm_indices pad rows — the
    kernels never let pad values reach a valid output).
    """
    entry_to, _ = window_perm_indices(H, W, ws, s_to, NP)
    _, exit_from = window_perm_indices(H, W, ws, s_from, NP)
    return exit_from[entry_to]
