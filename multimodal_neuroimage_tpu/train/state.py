"""Train state + jitted train/eval steps (GSPMD data-parallel).

TPU-native replacement for the reference's Trainer hot loop
(reference trainer.py:363-453):

  * CUDA AMP autocast + GradScaler (trainer.py:24-25, 84, 378-409) ->
    bf16 compute policy with fp32 master params (no loss scaling needed
    in bf16 — same exponent range as fp32).
  * DDP backward all-reduce (trainer.py:280-290) -> the batch is sharded on
    the mesh's 'data' axis; XLA inserts the gradient mean collectives over
    ICI inside one jitted step.
  * gradient accumulation gating (trainer.py:381, 390-409) -> optax.MultiSteps.
  * clip_grad_norm_ (trainer.py:394-407) -> optax.clip_by_global_norm.
  * per-iteration LR schedule (learning_rate.py:44-57) -> optax schedule fn
    baked into the optimizer chain.

Every model in ``models/`` is a flax Module whose ``__call__(batch, deterministic)``
takes the full batch dict and returns the reference's named-output dict
(SURVEY §2.4), so one generic train step serves all 6 phases.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from multimodal_neuroimage_tpu.train.losses import LossSpec, compute_losses
from multimodal_neuroimage_tpu.train.schedules import build_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def create_optimizer(optim: str, schedule: Callable, weight_decay: float,
                     gradient_clipping: bool = False, clip_max_norm: float = 1.0,
                     accumulation_steps: int = 1,
                     flatten: bool = True) -> optax.GradientTransformation:
    """Optimizer factory (reference trainer.py:166-173): Adam applies L2 into
    the gradient (torch.optim.Adam semantics), AdamW decouples the decay.

    ``flatten`` wraps the whole chain in ``optax.flatten`` so the update
    (and any grad-accumulation buffers) runs over ONE ravelled parameter
    vector instead of per-tensor loops — one fused XLA kernel chain instead
    of a kernel per parameter tensor, which matters on a launch-overhead-
    heavy backend. Mathematically identical (global-norm clipping, Adam,
    and decay are all elementwise or norm-global)."""
    parts = []
    if gradient_clipping:
        parts.append(optax.clip_by_global_norm(clip_max_norm))
    if optim.lower() == "adam":
        parts += [optax.add_decayed_weights(weight_decay),
                  optax.scale_by_adam()]
    elif optim.lower() == "adamw":
        parts += [optax.scale_by_adam(),
                  optax.add_decayed_weights(weight_decay)]
    else:
        raise ValueError(f"unknown optimizer {optim}")
    parts.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*parts)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    if flatten:
        tx = optax.flatten(tx)
    return tx


def optimizer_from_config(cfg, steps_per_epoch: int) -> Tuple[
        optax.GradientTransformation, Callable]:
    total = max(steps_per_epoch * cfg.nEpochs, 2)
    schedule = build_schedule(cfg.lr_policy, cfg.lr_init, total,
                              lr_step=cfg.lr_step, lr_gamma=cfg.lr_gamma,
                              lr_warmup=cfg.lr_warmup, lr_T_mult=cfg.lr_T_mult)
    tx = create_optimizer(cfg.optim, schedule, cfg.weight_decay,
                          cfg.gradient_clipping, cfg.clip_max_norm,
                          cfg.accumulation_steps,
                          flatten=getattr(cfg, "flatten_optimizer", True))
    return tx, schedule


def create_train_state(model, sample_batch: Dict[str, jnp.ndarray],
                       tx: optax.GradientTransformation,
                       seed: int = 55555555) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init({"params": init_rng, "dropout": init_rng,
                            "droppath": init_rng}, sample_batch,
                           deterministic=True)
    params = variables["params"]
    return TrainState(step=jnp.asarray(0), params=params,
                      opt_state=tx.init(params), rng=state_rng, tx=tx)


def _cast_tree(tree, dtype):
    def f(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(f, tree)


def param_grad_norms(params, grads) -> Dict[str, jnp.ndarray]:
    """Per-top-level-module parameter/gradient L2 norms plus the global grad
    norm — the ``wandb.watch(model, log='all', log_freq=10)`` equivalent
    (reference trainer.py:94-97), as cheap device scalars."""
    norms = {"grad/global": optax.global_norm(grads)}
    if isinstance(params, (dict, FrozenDict)):
        for key in params:
            norms[f"param/{key}"] = optax.global_norm(params[key])
            norms[f"grad/{key}"] = optax.global_norm(grads[key])
    return norms


def make_train_step(model, loss_specs: Dict[str, LossSpec],
                    compute_dtype: str = "bfloat16",
                    donate: bool = True, remat: bool = False,
                    mesh=None, extra_loss_fns=None,
                    with_norms: bool = False,
                    norms_every: int = 1) -> Callable:
    """Build the single jitted optimizer step.

    Returns fn(state, batch) -> (state, loss_dict, outputs) — or a 4-tuple
    with a norms dict appended when ``with_norms`` (gradient/parameter
    observability, reference trainer.py:94-97). With the batch committed to a
    'data'-sharded NamedSharding and params replicated, XLA compiles the full
    fwd+bwd+update with gradient collectives over ICI.
    ``remat`` checkpoints the forward (recompute in backward) to trade FLOPs
    for HBM (replaces nothing in the reference — a TPU memory lever).
    ``extra_loss_fns`` feeds stateful criteria (perceptual) to compute_losses.

    ``mesh`` pins the output state to the replicated sharding — without the
    constraint, GSPMD may pick a different layout for the returned state than
    the input had, and the next call RECOMPILES; under buffer donation this
    flip-flops every step (measured 16-46 s/step vs 1.1 s pinned).
    """
    cdtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    repl = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        repl = NamedSharding(mesh, PartitionSpec())

    def apply_fn(p, b, dropout_rng):
        return model.apply({"params": p}, b, deterministic=False,
                           rngs={"dropout": dropout_rng,
                                 "droppath": dropout_rng})

    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def loss_fn(params, batch, dropout_rng):
        p = _cast_tree(params, cdtype)
        b = _cast_tree(batch, cdtype)
        outputs = apply_fn(p, b, dropout_rng)
        outputs = _cast_tree(outputs, jnp.float32)
        losses = compute_losses(outputs, _cast_tree(batch, jnp.float32),
                                loss_specs, extra_fns=extra_loss_fns,
                                rng=dropout_rng)
        return losses["total"], (losses, outputs)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        (_, (losses, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        norms = None
        if with_norms:
            # lax.cond gates the full-tree norm reductions to logging steps
            # only (the trainer consumes them every norms_every steps — the
            # skipped steps' dict is zeros and never read)
            def _norms(p, g):
                return param_grad_norms(p, g)

            def _zeros(p, g):
                z = jnp.zeros((), jnp.float32)
                out = {"grad/global": z}
                if isinstance(p, (dict, FrozenDict)):
                    for key in p:
                        out[f"param/{key}"] = z
                        out[f"grad/{key}"] = z
                return out

            want = (state.step + 1) % norms_every == 0
            norms = jax.lax.cond(want, _norms, _zeros,
                                 state.params, grads)
        new_state = state.apply_gradients(grads)
        if repl is not None:
            new_state = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, repl),
                new_state)
        preds = {k: outputs[k] for k in ("binary_classification", "regression")
                 if k in outputs}
        if with_norms:
            return new_state, losses, preds, norms
        return new_state, losses, preds

    return train_step


def make_eval_step(model, loss_specs: Dict[str, LossSpec],
                   compute_dtype: str = "bfloat16",
                   extra_loss_fns=None) -> Callable:
    cdtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def eval_step(params, batch):
        p = _cast_tree(params, cdtype)
        b = _cast_tree(batch, cdtype)
        outputs = model.apply({"params": p}, b, deterministic=True)
        outputs = _cast_tree(outputs, jnp.float32)
        losses = compute_losses(outputs, _cast_tree(batch, jnp.float32),
                                loss_specs, extra_fns=extra_loss_fns)
        preds = {k: outputs[k] for k in ("binary_classification", "regression")
                 if k in outputs}
        return losses, preds

    return eval_step


def current_lr(schedule: Callable, step: int) -> float:
    return float(schedule(step))
