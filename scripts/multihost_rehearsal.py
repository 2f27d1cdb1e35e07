"""Two-process jax.distributed rehearsal (CPU) for the multi-host path.

Validates what single-process tests cannot: ``jax.distributed.initialize``
rendezvous, a global mesh spanning two processes, per-host batch slicing
assembled with ``make_array_from_process_local_data`` (parallel/mesh.py
shard_batch), one real sharded train step over the global mesh, and
``process_allgather`` making subject-level metrics global (the reference
aggregated rank-locally — SURVEY §5.8).

Run: python scripts/multihost_rehearsal.py            (spawns 2 workers)
     python scripts/multihost_rehearsal.py worker I P (internal)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 2


def worker(pid: int, port: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC
    assert jax.local_device_count() == DEV_PER_PROC

    import numpy as np
    from __graft_entry__ import _example_batch, _flagship_cfg
    from multimodal_neuroimage_tpu.models.registry import create_model
    from multimodal_neuroimage_tpu.parallel.mesh import (
        build_mesh, local_batch_slice, process_allgather, replicate,
        shard_batch)
    from multimodal_neuroimage_tpu.train.losses import active_losses
    from multimodal_neuroimage_tpu.train.state import (create_train_state,
                                                       make_train_step,
                                                       optimizer_from_config)

    cfg = _flagship_cfg(tiny=True)
    mesh = build_mesh()          # all 4 global devices on the 'data' axis
    assert mesh.devices.size == N_PROC * DEV_PER_PROC
    model = create_model(cfg)

    # global batch of 8; every host loads only its contiguous slice
    global_batch = _example_batch(8, t=32, r=cfg.intermediate_vec)
    sl = local_batch_slice(8)
    local_batch = {k: v[sl] for k, v in global_batch.items()}

    tx, _ = optimizer_from_config(cfg, steps_per_epoch=10)
    state = create_train_state(model, local_batch, tx, cfg.seed)
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    specs = active_losses(cfg.task, cfg.fine_tune_task)
    step = make_train_step(model, specs, compute_dtype="float32", mesh=mesh)

    dev_batch = shard_batch(local_batch, mesh)
    assert dev_batch["struct"].shape[0] == 8    # global shape restored
    state, losses, preds = step(state, dev_batch)
    total = float(losses["total"])
    assert np.isfinite(total), total

    # shard_map SPMD mode across PROCESSES (the multi-chip TPU path,
    # train/state.py grad_core): per-shard fwd+bwd + explicit pmean must
    # produce the same loss as the GSPMD step on the same global batch
    # (dropout rates are zero in the tiny flagship config).
    step_sm = make_train_step(model, specs, compute_dtype="float32",
                              mesh=mesh, spmd="shard_map", donate=False)
    state0 = create_train_state(model, local_batch, tx, cfg.seed)
    state0 = state0.replace(params=replicate(state0.params, mesh),
                            opt_state=replicate(state0.opt_state, mesh))
    _, losses_sm, _ = step_sm(state0, dev_batch)
    total_sm = float(losses_sm["total"])
    assert np.isfinite(total_sm), total_sm
    print(f"[worker {pid}] shard_map ok loss={total_sm:.4f}", flush=True)

    # subject-level metric globalisation: each host contributes its scores
    local_scores = np.arange(4, dtype=np.float32) + 100 * jax.process_index()
    gathered = process_allgather(local_scores)
    assert gathered.reshape(-1).shape[0] == 8, gathered.shape
    want = {0.0, 1.0, 2.0, 3.0, 100.0, 101.0, 102.0, 103.0}
    assert set(gathered.reshape(-1).tolist()) == want, gathered
    print(f"[worker {pid}] ok loss={total:.4f} gathered={sorted(set(gathered.reshape(-1).tolist()))}",
          flush=True)

    # HPO coordination protocol (hpo/optuna_harness.py): the leader
    # announces each trial as {stop, params} and ends with a stop sentinel;
    # leader-side failures (oversized payload) must raise on EVERY process
    # instead of hanging the followers in a mismatched collective.
    from multimodal_neuroimage_tpu.hpo import optuna_harness as oh
    _broadcast_obj = oh._broadcast_obj
    # trial numbers ride the announce; the leader "fails" trial 1 before its
    # announce (number skipped) — the follower's trial_N artifact folders
    # must mirror the leader's numbering (0 then 2), not a local counter
    if pid == 0:
        for n in (0, 2):
            _broadcast_obj({"kind": "trial", "stop": False, "number": n,
                            "params": {"lr_init": 1e-4 * (n + 1)}})
        _broadcast_obj({"kind": "trial", "stop": True})
    else:
        seen, numbers = [], []
        while True:
            msg = _broadcast_obj(None)
            if msg.get("stop", False):
                break
            seen.append(msg["params"])
            numbers.append(msg.get("number"))
        assert seen == [{"lr_init": 1e-4}, {"lr_init": 3e-4}], seen
        assert numbers == [0, 2], numbers
    try:
        _broadcast_obj({"blob": b"x" * 8192} if pid == 0 else None)
        raise AssertionError("oversized broadcast should raise")
    except ValueError as e:
        assert "too large" in str(e)
    print(f"[worker {pid}] hpo protocol ok", flush=True)

    # leader-local trial failure: the leader aborts a trial at an epoch
    # boundary while the follower sits at its prune checkpoint — the
    # follower must abandon the trial (TrialAborted) and resume cleanly at
    # the next announce instead of hanging (optuna_harness.py train_trial).
    if pid == 0:
        _broadcast_obj({"kind": "trial", "stop": False, "params": {"p": 1}})
        assert oh.broadcast_flag(False) is False        # epoch-1 prune: keep
        _broadcast_obj({"kind": "abort", "reason": "simulated I/O failure"})
        # next trial announced WITHOUT abort while the follower sits at a
        # prune checkpoint — the follower must stash it as pending
        _broadcast_obj({"kind": "trial", "stop": False, "params": {"p": 2}})
        _broadcast_obj({"kind": "trial", "stop": True})
    else:
        msg = _broadcast_obj(None)
        assert msg["params"] == {"p": 1}, msg
        assert oh.broadcast_flag(False) is False
        try:
            oh.broadcast_flag(False)                    # receives the abort
            raise AssertionError("expected TrialAborted")
        except oh.TrialAborted:
            pass
        try:
            oh.broadcast_flag(False)                    # receives announce #2
            raise AssertionError("expected TrialAborted (pending announce)")
        except oh.TrialAborted:
            pass
        assert oh._pending is not None and oh._pending["params"] == {"p": 2}
        oh._pending = None
        msg = _broadcast_obj(None)
        assert msg.get("stop") is True, msg
    print(f"[worker {pid}] hpo abort protocol ok", flush=True)

    # serving reduction (serve/predictor._global_reduce): each process
    # scored a disjoint shard of a 6-record cohort; the merged (sum, count)
    # must be identical on every process
    from multimodal_neuroimage_tpu.serve.predictor import _global_reduce
    s = np.zeros(6); c = np.zeros(6)
    mine = range(pid * 3, pid * 3 + 3)
    for i in mine:
        s[i] = float(10 * i)
        c[i] = 1.0 + (i % 2)        # some subjects have repeated windows
    gs, gc = _global_reduce(s, c)
    assert np.allclose(gs, [0., 10., 20., 30., 40., 50.]), gs
    assert np.allclose(gc, [1., 2., 1., 2., 1., 2.]), gc
    print(f"[worker {pid}] predict reduction ok", flush=True)

    # ragged metric gather (evaluation/metrics.gather_ragged): hosts hold
    # DIFFERENT valid-subject counts after padded eval tails — the global
    # stack must concatenate exactly the valid entries, in process order
    from multimodal_neuroimage_tpu.evaluation.metrics import gather_ragged
    mine = (np.asarray([1.0, 2.0, 3.0]) if pid == 0
            else np.asarray([10.0]))
    got = gather_ragged(mine)
    assert np.allclose(got, [1.0, 2.0, 3.0, 10.0]), got
    print(f"[worker {pid}] ragged gather ok", flush=True)

    # host-local rows of a data-sharded GLOBAL array (train/trainer.py
    # _flush_pending): device_get would raise on non-addressable shards;
    # host_local_rows must return exactly THIS host's loader slice
    from multimodal_neuroimage_tpu.parallel.mesh import host_local_rows
    local_rows = np.arange(8.0).reshape(4, 2) + 100.0 * pid
    gpred = shard_batch({"p": local_rows}, mesh)["p"]
    assert gpred.shape[0] == 8            # global batch assembled
    rows = host_local_rows(gpred)
    assert np.allclose(rows, local_rows), (pid, rows)
    print(f"[worker {pid}] host-local rows ok", flush=True)


def main() -> None:
    port = int(os.environ.get("REHEARSAL_PORT", "12577"))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i),
         str(port)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(N_PROC)]
    # 1-core images under concurrent load (a TPU bench's host-side tracing,
    # CI) have pushed the two workers' XLA:CPU compiles past 15 min
    outs = [p.communicate(timeout=2400)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.strip().splitlines()[-40:])
        print(f"--- worker {i} (rc={p.returncode}) ---\n{tail}")
    if any(p.returncode != 0 for p in procs):
        sys.exit(1)
    print("multihost rehearsal: OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
