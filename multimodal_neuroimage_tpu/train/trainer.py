"""Training runtime: config -> mesh -> pipeline -> jitted steps -> metrics.

TPU-native equivalent of the reference's Trainer (reference trainer.py:31-783)
with the mandated boot order (trainer.py:33-35): data -> lr handler -> model ->
checkpoint chain -> device placement -> optimizer -> writer -> losses. Here
device placement is a mesh + shardings and AMP/DDP are replaced by the bf16
policy + GSPMD step (see train/state.py).

``profiling=True`` shortens the run to 1 epoch / 10 batches for smoke/profile
parity with ``--profiling`` (main.py:98; trainer.py:301-302, 434-437) and wraps
the loop in a jax.profiler trace when ``profile_dir`` is set (replaces NVTX).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from multimodal_neuroimage_tpu.ckpt.checkpoint import (
    BestCheckpointPolicy, latest_checkpoint, load_checkpoint, load_raw_params,
    partial_restore, save_checkpoint)
from multimodal_neuroimage_tpu.data.loader import DataPipeline
from multimodal_neuroimage_tpu.evaluation.metrics import SubjectAccumulator
from multimodal_neuroimage_tpu.models.registry import create_model
from multimodal_neuroimage_tpu.obs.writer import Writer
from multimodal_neuroimage_tpu.parallel.mesh import (maybe_initialize_distributed,
                                                     mesh_for_batch,
                                                     replicate)
from multimodal_neuroimage_tpu.train.losses import active_losses
from multimodal_neuroimage_tpu.train.state import (create_train_state,
                                                   make_eval_step,
                                                   make_train_step,
                                                   optimizer_from_config)

PROFILING_MAX_BATCHES = 10  # --profiling cap (trainer.py:434-437)


class Trainer:
    def __init__(self, cfg, sets: Optional[List[str]] = None):
        self.cfg = cfg
        self.sets = sets or ["train", "val"]
        maybe_initialize_distributed(cfg.distributed)
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if cfg.remat:
            # remat the scanned block bodies (memory-bound runs; see
            # nn/common.py set_scan_remat for the perf tradeoff)
            from multimodal_neuroimage_tpu.nn.common import set_scan_remat
            set_scan_remat(True)
        # the data axis must divide the per-host batch; mesh_for_batch
        # shrinks it to the largest divisor (e.g. batch 4 on 8 chips)
        self.mesh = mesh_for_batch(cfg)

        # kernel execution plans (fusion layout / bert attention): resolved
        # once per process BEFORE any jit tracing — canary-compiles the fast
        # plans on TPU and falls back if the hardware rejects them
        from multimodal_neuroimage_tpu.ops.autoplan import resolve_plans
        resolve_plans(cfg.batch_size)

        # 1. data (trainer.py:58)
        self.pipeline = DataPipeline(cfg, self.mesh)
        steps = self.pipeline.steps_per_epoch("train")
        if steps == 0 and "train" in self.sets:
            # drop_last semantics (dataloaders.py:139) mean a train split
            # smaller than one GLOBAL batch yields zero steps — every epoch
            # would silently train nothing. Fail loudly instead.
            n_train = len(self.pipeline.splits["train"])
            raise ValueError(
                f"train split has {n_train} subjects but one global batch "
                f"needs {cfg.batch_size * jax.process_count()} "
                f"(batch_size={cfg.batch_size} x {jax.process_count()} "
                f"process(es)) — zero train steps per epoch. Shrink "
                f"batch_size or enlarge the cohort/train_split.")
        steps = max(steps, 1)

        # 2-3. schedule + model (trainer.py:59, 78)
        self._steps_per_epoch = steps
        self.tx, self.schedule = optimizer_from_config(cfg, steps)
        self.model = create_model(cfg)

        sample_batch, _ = next(self.pipeline.epoch(
            self.sets[0] if "train" not in self.sets else "train",
            shuffle=False))
        self.state = create_train_state(self.model, sample_batch, self.tx,
                                        cfg.seed)

        # 4. weight chaining / resume (trainer.py:79, 87, 118-162)
        self.epoch0 = 0
        self.val_threshold: Optional[float] = None
        self._restore_weights()

        self.state = self.state.replace(
            params=replicate(self.state.params, self.mesh),
            opt_state=replicate(self.state.opt_state, self.mesh))

        # 6-7. losses + steps + writer (trainer.py:89-104)
        self.loss_specs = active_losses(
            cfg.task, cfg.fine_tune_task,
            use_merge_loss=cfg.use_merge_loss, use_unet_loss=cfg.use_unet_loss,
            use_cont_loss=cfg.use_cont_loss, use_mask_loss=cfg.use_mask_loss,
            intensity_factor=cfg.intensity_factor,
            perceptual_factor=cfg.perceptual_factor,
            reconstruction_factor=cfg.reconstruction_factor)
        self.extra_loss_fns = None
        if "perceptual" in self.loss_specs:
            from multimodal_neuroimage_tpu.nn.perceptual import PerceptualLoss
            self.extra_loss_fns = {"perceptual": PerceptualLoss(
                task=cfg.task, weights_npz=cfg.vgg_weights_npz or None,
                seed=cfg.seed)}
        self.with_norms = cfg.log_grad_norms_every > 0
        self._build_steps()
        log_dir = os.path.join(cfg.experiment_folder or cfg.log_dir)
        wandb_kwargs = {"project": cfg.wandb_project, "mode": cfg.wandb_mode,
                        "name": cfg.experiment_title or cfg.exp_name}
        if cfg.wandb_entity:
            wandb_kwargs["entity"] = cfg.wandb_entity
        if cfg.wandb_key:
            os.environ.setdefault("WANDB_API_KEY", cfg.wandb_key)
        self.writer = Writer(log_dir, self.sets, cfg.running_mean_size,
                             use_tensorboard=bool(cfg.experiment_folder),
                             use_wandb=cfg.use_wandb,
                             wandb_kwargs=wandb_kwargs)
        self.accumulator = SubjectAccumulator(cfg.fine_tune_task)
        self.ckpt_policy = BestCheckpointPolicy(
            log_dir, cfg.experiment_title or cfg.exp_name, cfg.fine_tune_task)
        # pick up best-so-far metrics from BEST files already in the folder
        # (resume case — reference trainer.py:145); no-op on a fresh folder
        self.ckpt_policy.resume()
        self.pred_key = cfg.fine_tune_task
        self.optuna_trial = None  # set by hpo harness
        self.nan_subjects: Dict[str, set] = {}
        self._pending: List = []
        self._audit_queue: List = []

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        """(Re)build the jitted train/eval steps from the CURRENT execution
        plans — called at boot and again by the compile-failure fallback
        after autoplan demotes a plan (the plan globals are read at trace
        time, so a fresh jit picks up the demotion)."""
        cfg = self.cfg
        self.train_step = make_train_step(self.model, self.loss_specs,
                                          cfg.compute_dtype, mesh=self.mesh,
                                          extra_loss_fns=self.extra_loss_fns,
                                          with_norms=self.with_norms,
                                          norms_every=max(
                                              cfg.log_grad_norms_every, 1),
                                          spmd=cfg.spmd_mode,
                                          data_axis=cfg.mesh_axes[0])
        self.eval_step = make_eval_step(self.model, self.loss_specs,
                                        cfg.compute_dtype,
                                        extra_loss_fns=self.extra_loss_fns,
                                        mesh=self.mesh, spmd=cfg.spmd_mode,
                                        data_axis=cfg.mesh_axes[0])

    def _call_step(self, which: str, *args):
        """Invoke the jitted train/eval step with the plan-demotion fallback:
        a compile-resource failure (Mosaic scoped-vmem refusals are PROGRAM-
        dependent — see autoplan.demote_plan_after_compile_failure) demotes
        the fast plan and re-traces instead of killing the run. A failed
        compile never executes, so state/donated buffers are intact and the
        retry is safe."""
        from multimodal_neuroimage_tpu.ops.autoplan import (
            demote_plan_after_compile_failure)
        while True:
            try:
                return (self.train_step if which == "train"
                        else self.eval_step)(*args)
            except Exception as e:
                if demote_plan_after_compile_failure(e) is None:
                    raise
                self._build_steps()

    # ------------------------------------------------------------------
    def _recover_opt_state(self, resume: str, loaded: dict) -> dict:
        """The checkpoint's opt_state doesn't match the current optimizer's
        pytree (the round-4 fused-optimizer switch changed it for every
        pre-round-4 checkpoint). A silent fresh-restart of Adam moments AND
        the schedule count mid-run quietly changes training dynamics
        (round-4 advisor, medium), so instead:

          1. with fused_optimizer='auto', rebuild the legacy (unfused) optax
             chain and retry — if the checkpoint matches it, run the rest of
             this job unfused with moments + schedule intact;
          2. otherwise fail loudly unless cfg.fresh_opt_state=True opts into
             the restart explicitly."""
        cfg = self.cfg
        if getattr(cfg, "fused_optimizer", "auto") == "auto":
            tx, schedule = optimizer_from_config(cfg, self._steps_per_epoch,
                                                 fused_override="off")
            retry = load_checkpoint(resume, self.state.params,
                                    tx.init(self.state.params))
            if "opt_state_error" not in retry and "opt_state" in retry:
                print("[ckpt] legacy (unfused) optimizer state detected in "
                      f"{resume}; continuing with fused_optimizer='off' so "
                      "Adam moments and the LR schedule resume intact")
                self.tx, self.schedule = tx, schedule
                self.state = self.state.replace(tx=tx)
                return retry
        if getattr(cfg, "fresh_opt_state", False):
            print("[ckpt] fresh_opt_state=True: resuming params/step from "
                  f"{resume} with a FRESH optimizer state (Adam moments and "
                  "LR warmup restart)")
            return loaded
        raise RuntimeError(
            f"checkpoint {resume} carries an optimizer state incompatible "
            f"with the current optimizer ({loaded['opt_state_error']}), and "
            f"the legacy-optimizer retry did not match either. Resuming "
            f"would silently restart Adam moments and the LR schedule. Set "
            f"fresh_opt_state=True to opt into that explicitly, or pin "
            f"fused_optimizer/flatten_optimizer to the values the "
            f"checkpoint was trained with (see MIGRATION.md).")

    # ------------------------------------------------------------------
    def _restore_weights(self) -> None:
        cfg = self.cfg
        folder = cfg.experiment_folder or cfg.log_dir
        resume = latest_checkpoint(folder) if folder else None
        if resume:
            loaded = load_checkpoint(resume, self.state.params,
                                     self.state.opt_state)
            if "opt_state_error" in loaded:
                loaded = self._recover_opt_state(resume, loaded)
            self.state = self.state.replace(
                params=loaded["params"],
                opt_state=loaded.get("opt_state", self.state.opt_state),
                step=np.asarray(loaded["step"]))
            # checkpoints are written AFTER an epoch completes, so resume
            # at the next one (reference trainer.py:144 st_epoch = epoch+1)
            self.epoch0 = loaded["epoch"] + 1
            self.val_threshold = loaded["metadata"].get("val_threshold")
            print(f"resumed from {resume} (next epoch {self.epoch0})")
        elif cfg.model_weights_path:
            src = load_raw_params(cfg.model_weights_path)
            merged, stats = partial_restore(
                self.state.params, src,
                load_cls_embedding=cfg.load_cls_embedding)
            self.state = self.state.replace(params=merged)
            print(f"phase-chained weights from {cfg.model_weights_path}: "
                  f"{stats}")

    # ------------------------------------------------------------------
    @staticmethod
    def _drop_padded(names: List, scores: np.ndarray, targets: np.ndarray):
        """Remove pad-and-mask slots (name None) from a final partial eval
        batch (reference dataloaders.py:139 only drops last for train)."""
        if all(n is not None for n in names):
            return names, scores, targets
        keep = [i for i, n in enumerate(names) if n is not None]
        return ([names[i] for i in keep], scores[keep], targets[keep])

    def _record_batch(self, preds: Dict, batch: Dict, names: List[str],
                      mode: str) -> None:
        if self.pred_key not in preds:
            return
        # defer the device->host copy: keep the device arrays and flush
        # them in one batched transfer at summary time (keeps the step
        # pipeline free of per-step syncs)
        self._pending.append((names, preds[self.pred_key],
                              batch["target"], mode))

    def _flush_pending(self) -> None:
        self._flush_nan_audit()
        if not self._pending:
            return
        if jax.process_count() == 1:
            arrays = jax.device_get([(p[1], p[2]) for p in self._pending])
        else:
            # multi-host: preds/targets are global data-sharded arrays —
            # device_get would raise on non-addressable shards, and the
            # stored names are HOST-LOCAL. Take this host's rows; the
            # accumulator summary allgathers subject scores globally.
            from multimodal_neuroimage_tpu.parallel.mesh import \
                host_local_rows
            arrays = [(host_local_rows(p[1]), host_local_rows(p[2]))
                      for p in self._pending]
        for (names, _, _, mode), (scores, targets) in zip(self._pending,
                                                          arrays):
            names, scores, targets = self._drop_padded(
                names, np.asarray(scores).reshape(-1),
                np.asarray(targets).reshape(-1))
            if names:
                self.accumulator.append(names, scores, targets, mode)
        self._pending = []

    def _audit_nans(self, losses: Dict, names: List[str]) -> Dict:
        """Per-loss NaN audit collecting offending subject IDs (reference
        trainer.py:548-555). The audit is DEFERRED: device scalars are queued
        and fetched in ONE batched transfer at flush time — a per-step
        float() would sync the pipeline every step on the value-fetch-bound
        tunneled backend."""
        if self.cfg.nan_audit:
            self._audit_queue.append((list(names), dict(losses)))
        return losses

    def _flush_nan_audit(self) -> None:
        if not self._audit_queue:
            return
        fetched = jax.device_get([ls for _, ls in self._audit_queue])
        for (names, _), losses in zip(self._audit_queue, fetched):
            for k, v in losses.items():
                if not np.isfinite(float(v)):
                    self.nan_subjects.setdefault(k, set()).update(names)
                    print(f"[nan-audit] non-finite {k} loss; "
                          f"subjects {names}")
        self._audit_queue = []

    def train_epoch(self, epoch: int) -> None:
        cfg = self.cfg
        for i, (batch, names) in enumerate(
                self.pipeline.epoch("train", epoch)):
            norms = None
            if self.with_norms:
                self.state, losses, preds, norms = self._call_step(
                    "train", self.state, batch)
            else:
                self.state, losses, preds = self._call_step(
                    "train", self.state, batch)
            self.writer.write_losses(self._audit_nans(losses, names), "train")
            # norms are real values only on steps the jitted cond computed
            # them (state.step is post-update here, matching the kernel's
            # (step+1) % every predicate); logged after write_losses so the
            # step label matches the loss curves
            if norms is not None and \
                    int(self.state.step) % cfg.log_grad_norms_every == 0:
                self.writer.write_norms(norms, self.writer.total_train_steps)
            self._record_batch(preds, batch, names, "train")
            # mid-epoch validation every validation_frequency batches
            # (reference trainer.py:439-453; default is effectively off)
            if (i + 1) % cfg.validation_frequency == 0:
                self.eval_epoch("val", epoch)
                self._flush_pending()
                metrics = self.accumulator.summary(
                    ["train", "val"], val_threshold=self.val_threshold)
                self.writer.record_metrics(metrics)
                self.accumulator.reset(keep_mode="train")
            if cfg.profiling and i + 1 >= PROFILING_MAX_BATCHES:
                break

    def eval_epoch(self, mode: str, epoch: int = 0) -> None:
        cfg = self.cfg
        for i, (batch, names) in enumerate(
                self.pipeline.epoch(mode, epoch, shuffle=False)):
            losses, preds = self._call_step("eval", self.state.params, batch)
            # padded tail rows are EXCLUDED from the losses exactly inside
            # compute_losses via batch['valid'] (train/losses.py); ``w``
            # only weights the cross-batch running average by each batch's
            # valid-row count so per-batch means combine into the true
            # split-level mean (metrics are pad-cleaned in _drop_padded)
            w = sum(n is not None for n in names) / max(len(names), 1)
            self.writer.write_losses(self._audit_nans(losses, names), mode,
                                     weight=w)
            self._record_batch(preds, batch, names, mode)
            if cfg.profiling and i + 1 >= PROFILING_MAX_BATCHES:
                break

    # ------------------------------------------------------------------
    def training(self) -> Dict[str, float]:
        """Full loop (trainer.py:300-341). Returns the last metric summary."""
        cfg = self.cfg
        n_epochs = 1 if cfg.profiling else cfg.nEpochs
        metrics: Dict[str, float] = {}
        ctx = None
        if cfg.profile_dir:
            jax.profiler.start_trace(cfg.profile_dir)
        try:
            for epoch in range(self.epoch0, n_epochs):
                t0 = time.time()
                self.train_epoch(epoch)
                self.eval_epoch("val", epoch)
                lr = float(self.schedule(int(self.state.step)))
                self.writer.loss_summary(lr)
                self._flush_pending()
                metrics = self.accumulator.summary(
                    ["train", "val"], val_threshold=self.val_threshold)
                self.writer.write_subject_predictions(self.accumulator)
                self.writer.record_metrics(metrics)
                self.writer.save_history_to_csv()
                self.writer.register_wandb(epoch, lr)
                self.accumulator.reset()
                self._checkpoint(epoch, metrics)
                print(f"epoch {epoch} took {time.time() - t0:.1f}s")
                if self.optuna_trial is not None:
                    self._optuna_report(epoch, metrics)
        finally:
            if cfg.profile_dir:
                jax.profiler.stop_trace()
        return metrics

    def _checkpoint(self, epoch: int, metrics: Dict[str, float]) -> None:
        # freeze the validation threshold on EVERY process (metrics are
        # global via allgather): a non-zero rank that later runs testing()
        # must reuse it, not re-optimize the threshold on test data
        threshold = metrics.get("val_best_threshold")
        if threshold is not None:
            self.val_threshold = threshold
        if jax.process_index() != 0:
            return
        val_loss = None
        hist = self.writer.loss_history.get("total_val_loss_history")
        if hist:
            val_loss = hist[-1]
        self.ckpt_policy.update(
            val_auroc=metrics.get("val_AUROC"),
            val_acc=metrics.get("val_Balanced_Accuracy"),
            val_loss=val_loss,
            params=self.state.params, opt_state=self.state.opt_state,
            step=int(self.state.step), epoch=epoch,
            metadata={"val_threshold": self.val_threshold,
                      "metrics": metrics})
        if self.cfg.save_last_epoch and self.cfg.experiment_folder:
            # rolling per-epoch checkpoint (reference model.py:111-151):
            # a crash mid-run resumes from the last COMPLETED epoch, not
            # from the last best-metric improvement. latest_checkpoint
            # resumes by mtime, so this file wins unless a BEST file was
            # written later this same epoch (identical state either way).
            save_checkpoint(
                os.path.join(self.cfg.experiment_folder,
                             f"{self.ckpt_policy.title}_last_epoch.ckpt"),
                params=self.state.params, opt_state=self.state.opt_state,
                step=int(self.state.step), epoch=epoch,
                metadata={"val_threshold": self.val_threshold,
                          "metrics": metrics})

    def _optuna_report(self, epoch: int, metrics: Dict[str, float]) -> None:
        """Per-epoch pruning report (trainer.py:319-331). Works with real
        optuna trials and the fallback random-search trials alike."""
        value = (metrics.get("val_AUROC", 0.0)
                 if self.cfg.fine_tune_task == "binary_classification"
                 else self.writer.loss_history.get(
                     "total_val_loss_history", [float("inf")])[-1])
        self.optuna_trial.report(value, epoch)
        if self.optuna_trial.should_prune():
            try:
                import optuna
                raise optuna.TrialPruned()
            except ImportError:
                from multimodal_neuroimage_tpu.hpo.optuna_harness import _Pruned
                raise _Pruned()

    def testing(self) -> Dict[str, float]:
        """Phase-4 evaluation with the frozen val threshold
        (trainer.py:571-582, metrics.py:21-33)."""
        self.eval_epoch("test")
        self.writer.loss_summary(0.0)
        self._flush_pending()
        metrics = self.accumulator.summary(
            ["test"], val_threshold=self.val_threshold)
        self.writer.write_subject_predictions(self.accumulator)
        self.writer.record_metrics(metrics)
        self.writer.save_history_to_csv()
        self.accumulator.reset()
        return metrics
