"""Fused optimizer update: ONE Pallas kernel over the flat parameter vector.

The shipped optimizer is ``optax.flatten(chain(clip?, decay/adam, lr))``
(train/state.py create_optimizer — reference trainer.py:166-173 semantics).
On the v5e the chain costs ~3 ms/step at the flagship size: every link
(clip scale, weight decay, adam moments, bias correction, lr scale, apply)
is a separate XLA pass over the ~18 M-element flat vector, ~15 HBM sweeps
total (round-3 profile: "concats + fused Adam chain"; VERDICT r3 #5).

This module computes the SAME math in one Pallas kernel: per grid cell it
reads a chunk of (g, p, mu, nu), applies clip-scale -> (torch-Adam L2 |
AdamW decoupled decay) -> moment updates -> bias correction -> -lr scaling,
and writes (update, mu', nu') — 4 reads + 3 writes of HBM, the bandwidth
floor. The global-norm clip factor and the schedule LR are computed XLA-side
as scalars (one reduction pass) and passed in.

Numerics match the optax chain exactly op-for-op (f32 throughout):
  adam  — torch.optim.Adam: decay added INTO the gradient before the
          moments (optax.add_decayed_weights before scale_by_adam).
  adamw — decoupled: decay added to the adam direction after bias
          correction (scale_by_adam before add_decayed_weights).
  clip  — optax.clip_by_global_norm: scale = min(1, max_norm / ||g||).
  lr    — optax.scale_by_learning_rate(schedule): schedule evaluated at the
          PRE-increment step count, update negated.
Parity is asserted against the real optax chain in
tests/test_fused_update.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.flatten_util import ravel_pytree

_LANES = 1024          # flat vector is viewed as (rows, _LANES)
_ROWS_PER_CELL = 512   # 2 MB per operand ref per grid cell (7 refs ~ 14 MB)


class FusedAdamState(NamedTuple):
    count: jnp.ndarray         # int32 scalar, pre-increment step count
    mu: jnp.ndarray            # (rows, _LANES) f32 first moment, PADDED
    nu: jnp.ndarray            # (rows, _LANES) f32 second moment, PADDED
    # mu/nu live in the kernel's padded 2-D layout across steps so the
    # per-step pad (jnp.concatenate) / unpad (reshape+slice) full-size
    # copies happen once at init, not every update (round-4 advisor:
    # they eroded the 4-read/3-write HBM floor). g/p still pad per step —
    # they arrive as pytrees. Pad tail stays zero: 0*b1+(1-b1)*0 = 0.


def _kernel(mode_adamw: bool, wd: float, b1: float, b2: float, eps: float):
    def kernel(g_ref, p_ref, mu_ref, nu_ref, s_ref,
               upd_ref, mu_o_ref, nu_o_ref):
        g = g_ref[:]
        p = p_ref[:]
        mu = mu_ref[:]
        nu = nu_ref[:]
        scale = s_ref[0, 0]      # clip factor
        lr = s_ref[0, 1]
        bc1 = s_ref[0, 2]        # 1 / (1 - b1^count_inc)
        bc2 = s_ref[0, 3]
        g = g * scale
        if not mode_adamw and wd != 0.0:
            g = g + wd * p                       # torch-Adam L2 into grad
        mu2 = b1 * mu + (1.0 - b1) * g
        nu2 = b2 * nu + (1.0 - b2) * (g * g)
        u = (mu2 * bc1) / (jnp.sqrt(nu2 * bc2) + eps)
        if mode_adamw and wd != 0.0:
            u = u + wd * p                       # decoupled decay
        upd_ref[:] = -lr * u
        mu_o_ref[:] = mu2
        nu_o_ref[:] = nu2
    return kernel


def _pad_len(n: int) -> int:
    block = _LANES * _ROWS_PER_CELL
    return (n + block - 1) // block * block


def _pad2d(x, np_: int):
    """(N,) flat -> (rows, _LANES) padded view (one copy when pad > 0)."""
    pad = np_ - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), jnp.float32)])
    return x.reshape(-1, _LANES)


def _fused_flat_update(gflat, pflat, mu, nu, scalars, mode_adamw, wd,
                       b1, b2, eps, interpret):
    """Run the kernel over the padded flat vectors. mu/nu arrive AND return
    in the padded (rows, _LANES) state layout; the update is un-padded."""
    n = gflat.shape[0]
    np_ = _pad_len(n)
    rows = np_ // _LANES
    n_cells = rows // _ROWS_PER_CELL
    spec = pl.BlockSpec((_ROWS_PER_CELL, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
    upd, mu2, nu2 = pl.pallas_call(
        _kernel(mode_adamw, wd, b1, b2, eps),
        grid=(n_cells,),
        in_specs=[spec, spec, spec, spec, sspec],
        out_specs=[spec, spec, spec],
        out_shape=[out_shape] * 3,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(_pad2d(gflat, np_), _pad2d(pflat, np_), mu, nu, scalars)
    return upd.reshape(-1)[:n], mu2, nu2


def fused_adam(schedule: Callable, weight_decay: float, mode: str = "adam",
               gradient_clipping: bool = False, clip_max_norm: float = 1.0,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               interpret: Optional[bool] = None
               ) -> optax.GradientTransformation:
    """GradientTransformation computing the whole update in one kernel.

    Drop-in for ``create_optimizer(...)`` when ``accumulation_steps == 1``
    and the optimizer is adam/adamw. ``interpret=None`` auto-selects the
    Pallas interpreter off-TPU (same convention as the other fused ops)."""
    mode = mode.lower()
    if mode not in ("adam", "adamw"):
        raise ValueError(f"fused_adam supports adam/adamw, got {mode!r}")
    adamw = mode == "adamw"

    def init(params):
        flat, _ = ravel_pytree(params)
        rows = _pad_len(flat.shape[0]) // _LANES
        return FusedAdamState(count=jnp.zeros((), jnp.int32),
                              mu=jnp.zeros((rows, _LANES), jnp.float32),
                              nu=jnp.zeros((rows, _LANES), jnp.float32))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("fused_adam requires params")
        gflat, unravel = ravel_pytree(grads)
        gflat = gflat.astype(jnp.float32)
        pflat, _ = ravel_pytree(params)
        pflat = pflat.astype(jnp.float32)

        if gradient_clipping:
            g_norm = jnp.sqrt(jnp.sum(gflat * gflat))
            scale = jnp.where(g_norm < clip_max_norm, 1.0,
                              clip_max_norm / jnp.maximum(g_norm, 1e-38))
        else:
            scale = jnp.float32(1.0)
        count_inc = state.count + 1
        lr = jnp.asarray(schedule(state.count), jnp.float32)
        bc1 = 1.0 / (1.0 - b1 ** count_inc.astype(jnp.float32))
        bc2 = 1.0 / (1.0 - b2 ** count_inc.astype(jnp.float32))
        scalars = jnp.zeros((1, _LANES), jnp.float32)
        scalars = scalars.at[0, 0].set(scale).at[0, 1].set(lr)
        scalars = scalars.at[0, 2].set(bc1).at[0, 3].set(bc2)

        itp = interpret
        if itp is None:
            itp = jax.default_backend() != "tpu"
        upd, mu2, nu2 = _fused_flat_update(
            gflat, pflat, state.mu, state.nu, scalars, adamw,
            float(weight_decay), b1, b2, eps, itp)
        return (unravel(upd),
                FusedAdamState(count=count_inc, mu=mu2, nu=nu2))

    return optax.GradientTransformation(init, update)
