"""2-D UNet denoiser (reference model.py:731-800, 846-859).

Topology matches the reference exactly: DoubleConv stem 1->64, four
maxpool+DoubleConv downs (64->128->256->512->1024), four ConvTranspose ups
with skip concatenation (1024->512->256->128->1; ``bilinear=False``,
model.py:848 — the final Up emits the single output channel directly).
Odd spatial sizes (84 -> 42 -> 21 -> 10 -> 5) are handled by padding the
upsampled map to the skip's size, as the reference does with F.pad
(model.py:781-786).

Norm: the reference uses BatchNorm2d. Here normalization uses the batch
statistics in BOTH modes (train-mode BN semantics) with learned scale/bias
but no running-average state — running stats would force a mutable variable
collection through the jitted step for a denoiser whose eval batches are
full-sized anyway. Layout is NHWC throughout (TPU native).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_kaiming = nn.initializers.kaiming_normal()


class BatchStatNorm(nn.Module):
    """Per-channel normalization over (batch, H, W) with learned affine."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(0, 1, 2))
        var = x32.var(axis=(0, 1, 2))
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> relu) x2 (model.py:731-749)."""

    out_ch: int
    mid_ch: int | None = None

    @nn.compact
    def __call__(self, x):
        mid = self.mid_ch or self.out_ch
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                    kernel_init=_kaiming, name="conv1")(x)
        x = nn.relu(BatchStatNorm(name="bn1")(x))
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                    kernel_init=_kaiming, name="conv2")(x)
        return nn.relu(BatchStatNorm(name="bn2")(x))


def max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class Up(nn.Module):
    """ConvTranspose 2x up, pad to skip size, concat, DoubleConv
    (model.py:765-792, bilinear=False branch)."""

    out_ch: int

    @nn.compact
    def __call__(self, x1, x2):
        in_ch = x1.shape[-1]
        x1 = nn.ConvTranspose(in_ch // 2, (2, 2), strides=(2, 2),
                              kernel_init=_kaiming, name="up")(x1)
        dy = x2.shape[1] - x1.shape[1]
        dx = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(x1, ((0, 0), (dy // 2, dy - dy // 2),
                          (dx // 2, dx - dx // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_ch, name="conv")(x)


class UNet2D(nn.Module):
    """Full 4-down/4-up UNet; (B, H, W, 1) -> (B, H, W, 1).

    ``inject`` (optional, shaped like the 1024-ch bottleneck) supports PRS
    latent injection at the UNet bottom via add/hadamard
    (model.py:2462-2483)."""

    base: int = 64

    @nn.compact
    def __call__(self, x, deterministic: bool = True, inject=None,
                 concat_method: str = "add"):
        b = self.base
        x1 = DoubleConv(b, name="inc")(x)
        x2 = DoubleConv(2 * b, name="down1")(max_pool_2x2(x1))
        x3 = DoubleConv(4 * b, name="down2")(max_pool_2x2(x2))
        x4 = DoubleConv(8 * b, name="down3")(max_pool_2x2(x3))
        x5 = DoubleConv(16 * b, name="down4")(max_pool_2x2(x4))
        if inject is not None:
            x5 = x5 * inject if concat_method == "hadamard" else x5 + inject
        y = Up(8 * b, name="up1")(x5, x4)
        y = Up(4 * b, name="up2")(y, x3)
        y = Up(2 * b, name="up3")(y, x2)
        return Up(1, name="up4")(y, x1)
