"""Learning-rate schedules (per-iteration), as pure optax schedule fns.

Mirrors the reference's LrHandler policies (reference learning_rate.py:18-81)
and its CosineAnnealingWarmUpRestarts (learning_rate.py:86-169):

  * 'step'      — StepLR per iteration with a final-lr floor of 1e-7
                  (schedule_check_and_update stops stepping below the floor,
                  learning_rate.py:44-48)
  * 'SGDR'      — warmup from ~0 then cosine cycles whose max_lr decays by
                  gamma (forced to 0.5 for SGDR, learning_rate.py:31) each
                  cycle; first cycle = 30% of total iterations, min_lr 1e-9
  * 'OneCycle'  — torch OneCycleLR defaults (cos anneal, pct_start .3,
                  div_factor 25, final_div_factor 1e4)
  * 'CosAnn'    — CosineAnnealingLR(T_max=100, eta_min=0) closed form

All are t -> lr functions usable with optax.inject_hyperparams / scale_by_schedule.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

FINAL_LR = 1e-7  # floor (learning_rate.py:20)


def step_schedule(base_lr: float, step_size: int, gamma: float,
                  final_lr: float = FINAL_LR):
    def fn(t):
        lr = base_lr * gamma ** (t // step_size)
        return jnp.maximum(lr, final_lr)
    return fn


def sgdr_schedule(base_lr: float, total_iterations: int,
                  warmup_steps: int | None = None, t_mult: int = 1,
                  gamma: float = 0.5, min_lr: float = 1e-9,
                  first_cycle_frac: float = 0.3):
    """CosineAnnealingWarmUpRestarts semantics (learning_rate.py:86-169):
    every cycle starts with a linear warmup from min_lr to the gamma-decayed
    max_lr, then cosine-decays back to min_lr. Cycle length grows by t_mult
    (only t_mult == 1 keeps a closed form; larger values are unrolled)."""
    first_cycle = max(int(first_cycle_frac * total_iterations), 2)
    if warmup_steps is None:
        warmup_steps = int(total_iterations * 0.05)
    warmup_steps = min(warmup_steps, first_cycle - 1)

    # Precompute cycle boundaries (static python — a handful of cycles).
    bounds = []
    start, length = 0, first_cycle
    while start < total_iterations * (max(t_mult, 1) + 1) + first_cycle:
        bounds.append((start, length))
        start += length
        length = (length - warmup_steps) * max(t_mult, 1) + warmup_steps
        if len(bounds) > 64:
            break
    starts = jnp.asarray([b[0] for b in bounds])
    lengths = jnp.asarray([b[1] for b in bounds])

    def fn(t):
        t = jnp.asarray(t)
        cycle = jnp.sum(t >= starts) - 1
        cycle = jnp.clip(cycle, 0, len(bounds) - 1)
        tc = t - starts[cycle]
        clen = lengths[cycle]
        max_lr = base_lr * gamma ** cycle
        warm = min_lr + (max_lr - min_lr) * tc / jnp.maximum(warmup_steps, 1)
        cos = min_lr + (max_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (tc - warmup_steps)
                          / jnp.maximum(clen - warmup_steps, 1)))
        return jnp.where(tc < warmup_steps, warm, cos)
    return fn


def onecycle_schedule(base_lr: float, total_iterations: int):
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_iterations, 2), peak_value=base_lr,
        pct_start=0.3, div_factor=25.0, final_div_factor=1e4)


def cosann_schedule(base_lr: float, t_max: int = 100, eta_min: float = 0.0):
    def fn(t):
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * jnp.asarray(t) / t_max))
    return fn


def build_schedule(lr_policy: str, base_lr: float, total_iterations: int, *,
                   lr_step: int = 500, lr_gamma: float = 0.97,
                   lr_warmup: int | None = None, lr_T_mult: int = 1):
    """Factory keyed like LrHandler.get_scheduler (learning_rate.py:59-81)."""
    if lr_policy == "step":
        return step_schedule(base_lr, lr_step, lr_gamma)
    if lr_policy == "SGDR":
        return sgdr_schedule(base_lr, total_iterations, lr_warmup, lr_T_mult)
    if lr_policy == "OneCycle":
        return onecycle_schedule(base_lr, total_iterations)
    if lr_policy == "CosAnn":
        return cosann_schedule(base_lr)
    raise NotImplementedError(f"lr policy {lr_policy}")
