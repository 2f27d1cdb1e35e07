"""Fused on-device fMRI preprocessing: FIR band split + zscore + pad.

The reference recomputes a nitime FIR filtfilt **per item, per epoch, on CPU
dataloader workers** (reference datasets.py:272-307) — the #1 input-pipeline
cost (SURVEY §7.2 step 5).  Here the raw (ROI, T) series is shipped to the TPU
once and the whole band-split pipeline runs as one jitted XLA program:

    odd-extension -> zero-phase FIR (fwd+bwd conv) -> residual split ->
    masked per-ROI zscore -> symmetric pad placement

Variable native lengths (350-361 TRs, datasets.py:221-223) are handled with
static shapes + gather/mask arithmetic, so one compiled program serves every
subject. Numerics match scipy.signal.filtfilt (odd padding, padlen=3*ntaps)
to ~1e-5; see tests/test_filters.py.

Everything here is elementwise/conv work that XLA fuses well on the VPU; the
MXU-bound hot loops (window attention) live in ops/window_attention.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_neuroimage_tpu.data.filters import design_highpass_fir


def masked_zscore(x: jnp.ndarray, mask: jnp.ndarray, axis, eps: float = 1e-12):
    """zscore over the True region of ``mask`` (ddof=0, scipy semantics)."""
    mask = mask.astype(x.dtype)
    n = jnp.sum(mask, axis=axis, keepdims=True)
    mean = jnp.sum(x * mask, axis=axis, keepdims=True) / n
    var = jnp.sum(((x - mean) ** 2) * mask, axis=axis, keepdims=True) / n
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _correlate_valid(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Valid cross-correlation along the last axis; x: (R, L), taps: (ntaps,).

    Computes y[j] = sum_k b[k] x[j + M - k]  (an lfilter step with the first M
    samples of x acting as initial conditions), M = ntaps - 1.
    """
    lhs = x[:, None, :]                            # (R, 1, L)   NCH
    rhs = taps[::-1][None, None, :]                # (1, 1, ntaps) OIH
    out = jax.lax.conv_general_dilated(
        lhs, rhs.astype(x.dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        # full f32: default conv precision drops to bf16-class on MXU/oneDNN,
        # which is not acceptable for a 65-tap filter applied twice
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[:, 0, :]


def _filtfilt_fixed(x: jnp.ndarray, T: jnp.ndarray, taps: jnp.ndarray,
                    t_max: int) -> jnp.ndarray:
    """Zero-phase FIR filtering of one (R, t_max) buffer whose first ``T``
    columns are valid. Exactly reproduces scipy.signal.filtfilt(b, 1, x)
    (odd extension, padlen = 3*ntaps, steady-state initial conditions)."""
    ntaps = taps.shape[0]
    m = ntaps - 1
    padlen = 3 * ntaps
    ext_len = t_max + 2 * padlen

    j = jnp.arange(ext_len)
    front = j < padlen
    mid = (j >= padlen) & (j < padlen + T)
    back = (j >= padlen + T) & (j < 2 * padlen + T)

    idx = jnp.where(front, padlen - j,
                    jnp.where(mid, j - padlen, T - 2 - (j - padlen - T)))
    idx = jnp.clip(idx, 0, t_max - 1)
    vals = jnp.take(x, idx, axis=1)                          # (R, ext_len)
    x0 = x[:, 0:1]
    xlast = jnp.take(x, jnp.clip(T - 1, 0, t_max - 1), axis=1)[:, None]
    ext = jnp.where(front, 2.0 * x0 - vals,
                    jnp.where(mid, vals,
                              jnp.where(back, 2.0 * xlast - vals, 0.0)))

    l_valid = T + 2 * padlen

    # forward pass: steady-state ICs == prepending M copies of ext[0]
    xin = jnp.concatenate([jnp.repeat(ext[:, 0:1], m, axis=1), ext], axis=1)
    y = _correlate_valid(xin, taps)                          # (R, ext_len)

    # reverse within the valid extent
    ridx = jnp.clip(l_valid - 1 - j, 0, ext_len - 1)
    yr = jnp.where(j < l_valid, jnp.take(y, ridx, axis=1), 0.0)

    yin = jnp.concatenate([jnp.repeat(yr[:, 0:1], m, axis=1), yr], axis=1)
    z = _correlate_valid(yin, taps)

    zf = jnp.where(j < l_valid, jnp.take(z, ridx, axis=1), 0.0)
    return zf[:, padlen:padlen + t_max]                      # (R, t_max)


def _place_padded(band: jnp.ndarray, T: jnp.ndarray, t_max: int) -> jnp.ndarray:
    """Scatter a (R, t_max) band (first T valid) into the reference's padded
    layout: front pad (t_max - T)//2 zeros, transpose to (t_max, R)
    (datasets.py:222-229)."""
    front = (t_max - T) // 2
    t_out = jnp.arange(t_max)
    src = jnp.clip(t_out - front, 0, t_max - 1)
    valid = (t_out >= front) & (t_out < front + T)
    out = jnp.take(band, src, axis=1) * valid[None, :].astype(band.dtype)
    return out.T


def _bandsplit_one(x: jnp.ndarray, T: jnp.ndarray, taps: jnp.ndarray,
                   t_max: int, global_zscore_raw: bool) -> Dict[str, jnp.ndarray]:
    tmask = (jnp.arange(t_max) < T)[None, :]                 # (1, t_max)
    x = x * tmask.astype(x.dtype)

    high = _filtfilt_fixed(x, T, taps, t_max)                # "low" band (>= lb Hz)
    ultralow = x - high

    if global_zscore_raw:
        raw_z = masked_zscore(x, tmask, axis=(0, 1))
    else:
        raw_z = masked_zscore(x, tmask, axis=1)
    low_z = masked_zscore(high, tmask, axis=1)
    ul_z = masked_zscore(ultralow, tmask, axis=1)

    return {
        "raw": _place_padded(raw_z, T, t_max),
        "low": _place_padded(low_z, T, t_max),
        "ultralow": _place_padded(ul_z, T, t_max),
    }


@partial(jax.jit, static_argnames=("t_max", "global_zscore_raw", "fir_order",
                                   "lb_hz", "tr_seconds"))
def fir_bandsplit_batch(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    t_max: int = 368,
    lb_hz: float = 0.0035,
    tr_seconds: float = 0.8,
    fir_order: int = 64,
    global_zscore_raw: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Band-split a batch of raw series on device.

    Args:
      x: (B, R, t_max) float32, zero-filled beyond each native length.
      lengths: (B,) int32 native lengths (350-361 for ABCD).
    Returns:
      dict of (B, t_max, R) float32: 'raw', 'low', 'ultralow' — each z-scored
      per ROI over the native extent and symmetrically zero-padded, matching
      the reference's per-item host pipeline (datasets.py:272-307).
    """
    taps = jnp.asarray(design_highpass_fir(fir_order, lb_hz, 1.0 / tr_seconds),
                       dtype=x.dtype)
    fn = partial(_bandsplit_one, taps=taps, t_max=t_max,
                 global_zscore_raw=global_zscore_raw)
    return jax.vmap(fn)(x, lengths)
