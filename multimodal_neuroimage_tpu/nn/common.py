"""Shared NN building blocks (flax.linen)."""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
xavier_uniform_init = nn.initializers.xavier_uniform()


def leaky_relu(x, negative_slope: float = 0.01):
    return jax.nn.leaky_relu(x, negative_slope)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath semantics, used throughout
    the reference's Swin stacks — swin_v2_module.py:239)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    """fc1 -> act -> drop -> fc2 -> drop (swin_v2_module.py:16-32)."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = nn.gelu
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
