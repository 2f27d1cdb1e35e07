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
                     flatten: bool = True,
                     fused: str = "auto") -> optax.GradientTransformation:
    """Optimizer factory (reference trainer.py:166-173): Adam applies L2 into
    the gradient (torch.optim.Adam semantics), AdamW decouples the decay.

    ``flatten`` wraps the whole chain in ``optax.flatten`` so the update
    (and any grad-accumulation buffers) runs over ONE ravelled parameter
    vector instead of per-tensor loops — one fused XLA kernel chain instead
    of a kernel per parameter tensor, which matters on a launch-overhead-
    heavy backend. Mathematically identical (global-norm clipping, Adam,
    and decay are all elementwise or norm-global).

    ``fused`` ("auto"/"on"/"off") selects ops/fused_update.fused_adam — the
    whole clip/decay/adam/lr chain as ONE Pallas kernel over the flat
    vector (4 HBM reads + 3 writes instead of ~15 sweeps; parity-tested
    against this exact optax chain). auto = on whenever the chain below
    would be adam/adamw without gradient accumulation."""
    optim_known = optim.lower() in ("adam", "adamw")
    if fused not in ("auto", "on", "off"):
        raise ValueError(f"fused must be auto/on/off, got {fused!r}")
    if fused != "off" and optim_known and accumulation_steps <= 1:
        from multimodal_neuroimage_tpu.ops.fused_update import fused_adam
        return fused_adam(schedule, weight_decay, mode=optim.lower(),
                          gradient_clipping=gradient_clipping,
                          clip_max_norm=clip_max_norm)
    if fused == "on":
        raise ValueError("fused='on' requires adam/adamw and "
                         "accumulation_steps == 1")
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


def optimizer_from_config(cfg, steps_per_epoch: int,
                          fused_override: Optional[str] = None) -> Tuple[
        optax.GradientTransformation, Callable]:
    """``fused_override`` forces the fused_adam selection regardless of the
    config — used by Trainer's legacy-checkpoint fallback to rebuild the
    pre-fused (optax-chain) optimizer whose opt_state pytree matches old
    checkpoints."""
    total = max(steps_per_epoch * cfg.nEpochs, 2)
    schedule = build_schedule(cfg.lr_policy, cfg.lr_init, total,
                              lr_step=cfg.lr_step, lr_gamma=cfg.lr_gamma,
                              lr_warmup=cfg.lr_warmup, lr_T_mult=cfg.lr_T_mult)
    tx = create_optimizer(cfg.optim, schedule, cfg.weight_decay,
                          cfg.gradient_clipping, cfg.clip_max_norm,
                          cfg.accumulation_steps,
                          flatten=getattr(cfg, "flatten_optimizer", True),
                          fused=(fused_override if fused_override is not None
                                 else getattr(cfg, "fused_optimizer",
                                              "auto")))
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


def _batch_pspecs(batch, axis: str):
    """Per-leaf PartitionSpecs for a host batch pytree: dim-0 sharded on the
    data axis, scalars replicated (mirrors parallel.mesh.shard_batch)."""
    from jax.sharding import PartitionSpec as P
    return jax.tree_util.tree_map(
        lambda x: P() if jnp.ndim(x) == 0 else P(axis), batch)


def tpu_compiler_options() -> Optional[Dict[str, int]]:
    """Per-jit XLA options for the train/eval steps on TPU.

    ``xla_tpu_scoped_vmem_limit_kib`` governs how much VMEM *XLA itself*
    may use for fusion stack allocations. The 16 MB default rejects the
    batched Pallas plans: XLA co-schedules the kernels' operand-prep
    fusions into scoped VMEM together with the kernel's own declared need
    (~102 MB at the flagship geometry under Mosaic's separate 112 MB cap),
    and the combined total trips ITS limit — 'Scoped allocation with size
    101.89M and limit 16.00M' on v5e, even though the same kernel compiles
    standalone. The v5e has 128 MB of VMEM; raise XLA's share to match the
    kernels' cap (env XLA_SCOPED_VMEM_KIB overrides; 0 disables). Plan
    demotion (ops/autoplan.demote_plan_after_compile_failure) remains the
    safety net if a geometry still refuses."""
    import os
    kib = int(os.environ.get("XLA_SCOPED_VMEM_KIB", str(112 * 1024)))
    try:
        if kib <= 0 or jax.default_backend() != "tpu":
            return None
    except Exception:                               # pragma: no cover
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


def _set_fusion_stream_policy(cdtype) -> None:
    """Tell the SwinFusion stacks whether the session's compute policy is
    bf16: FUSION_STREAM16 re-casts the f32-arriving struct stream back to
    bf16 at BP/BPR stack entry, but an explicit compute_dtype=float32 run
    must stay f32 end-to-end (nn/swinfusion._POLICY16)."""
    import multimodal_neuroimage_tpu.nn.swinfusion as _sf
    _sf._POLICY16 = cdtype == jnp.bfloat16


def use_shard_map(spmd: str, mesh, axis: str = "data") -> bool:
    """Decide whether the train/eval steps run through ``jax.shard_map``.

    GSPMD cannot partition a ``pallas_call`` — under plain ``jit`` with a
    sharded batch the partitioner would have to all-gather the fused kernels'
    operands onto every chip. ``shard_map`` makes each chip run the kernels
    on its LOCAL batch shard with one explicit gradient ``pmean``, which is
    exactly the reference's DDP decomposition (trainer.py:280-290) expressed
    the TPU way. Modes:

      * "auto" (default): shard_map exactly when the fused kernels are in
        play (mesh devices are TPUs) and the data axis is actually split;
        plain-jnp paths (CPU meshes, single chip) stay on GSPMD.
      * "shard_map" / "gspmd": pin explicitly (tests, experiments).
    """
    if mesh is None or axis not in mesh.axis_names:
        return False
    if spmd == "shard_map":
        return True
    if spmd == "gspmd":
        return False
    if spmd != "auto":
        raise ValueError(f"unknown spmd mode {spmd!r}")
    try:
        platform = mesh.devices.flat[0].platform
    except Exception:
        platform = "unknown"
    return int(mesh.shape[axis]) > 1 and platform == "tpu"


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
                    norms_every: int = 1,
                    spmd: str = "auto",
                    data_axis: str = "data") -> Callable:
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

    ``spmd`` (see ``use_shard_map``) selects how the step is partitioned
    over the mesh's data axis: "gspmd" traces one global program and lets the
    partitioner insert collectives; "shard_map" runs the fwd+bwd PER SHARD
    with an explicit gradient ``pmean`` — required for the Pallas fused
    kernels on a multi-chip mesh (a pallas_call is a black box to the GSPMD
    partitioner). Under shard_map the per-shard dropout rngs are decorrelated
    by folding in the axis index, and batch-pairwise losses (merge /
    contrastive, reference losses.py:128-219) are computed within each shard
    — exactly the reference's per-rank DDP loss semantics
    (trainer.py:280-290)."""
    cdtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    _set_fusion_stream_policy(cdtype)
    shard = use_shard_map(spmd, mesh, data_axis)

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

    def grad_core(params, batch, rng):
        if shard:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
            # CRITICAL: mark the replicated params VARYING before
            # differentiating. Under shard_map's varying-manual-axes
            # semantics, the cotangent of an UNVARYING input is implicitly
            # psum'ed over the mesh axis — each shard's "local" grad would
            # already be the global SUM, and the pmean below would then be
            # an identity on replicated values, leaving gradients N_shards
            # x too large (caught by tests/test_shard_map.py bitwise
            # parity). pcast(to="varying") makes the grad truly local so
            # the DDP mean is taken exactly once, explicitly.
            params = jax.tree_util.tree_map(
                lambda x: jax.lax.pcast(x, data_axis, to="varying"), params)
        (_, (losses, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        preds = {k: outputs[k] for k in ("binary_classification", "regression")
                 if k in outputs}
        if shard:
            grads = jax.lax.pmean(grads, data_axis)
            losses = jax.lax.pmean(losses, data_axis)
        return grads, losses, preds

    @partial(jax.jit, donate_argnums=(0,) if donate else (),
             compiler_options=tpu_compiler_options())
    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        core = grad_core
        if shard:
            from jax.sharding import PartitionSpec as P
            # check_vma=False: the fused Pallas kernels' internal
            # ShapeDtypeStructs carry no varying-mesh-axes annotation, and
            # jax's default vma validation rejects a pallas_call inside
            # shard_map (the whole point of this path). Per-shard semantics
            # are unchanged; the explicit out_specs/pmean still govern.
            core = jax.shard_map(
                grad_core, mesh=mesh,
                in_specs=(P(), _batch_pspecs(batch, data_axis), P()),
                out_specs=(P(), P(), P(data_axis)), check_vma=False)
        grads, losses, preds = core(state.params, batch, rng)
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
        if with_norms:
            return new_state, losses, preds, norms
        return new_state, losses, preds

    return train_step


def make_eval_step(model, loss_specs: Dict[str, LossSpec],
                   compute_dtype: str = "bfloat16",
                   extra_loss_fns=None,
                   mesh=None, spmd: str = "auto",
                   data_axis: str = "data") -> Callable:
    cdtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    _set_fusion_stream_policy(cdtype)
    shard = use_shard_map(spmd, mesh, data_axis)

    def eval_core(params, batch):
        p = _cast_tree(params, cdtype)
        b = _cast_tree(batch, cdtype)
        outputs = model.apply({"params": p}, b, deterministic=True)
        outputs = _cast_tree(outputs, jnp.float32)
        losses = compute_losses(outputs, _cast_tree(batch, jnp.float32),
                                loss_specs, extra_fns=extra_loss_fns)
        preds = {k: outputs[k] for k in ("binary_classification", "regression")
                 if k in outputs}
        if shard:
            losses = jax.lax.pmean(losses, data_axis)
        return losses, preds

    @partial(jax.jit, compiler_options=tpu_compiler_options())
    def eval_step(params, batch):
        core = eval_core
        if shard:
            from jax.sharding import PartitionSpec as P
            core = jax.shard_map(
                eval_core, mesh=mesh,
                in_specs=(P(), _batch_pspecs(batch, data_axis)),
                out_specs=(P(), P(data_axis)), check_vma=False)
        return core(params, batch)

    return eval_step


def current_lr(schedule: Callable, step: int) -> float:
    return float(schedule(step))
