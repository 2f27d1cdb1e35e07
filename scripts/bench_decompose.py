"""Decomposition bench: attribute flagship step time to BERT / fusion / rest.

Times the full Func_Struct_Cross train step against variants with the BERT
stacks or the SwinFusion stacks shrunk to depth 1; the deltas attribute step
time per subsystem. Run on the TPU:  python scripts/bench_decompose.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def step_time(cfg_overrides, label, n_steps=25, per_chip_batch=8):
    from __graft_entry__ import _example_batch, _flagship_cfg
    from multimodal_neuroimage_tpu.models.registry import create_model
    from multimodal_neuroimage_tpu.parallel.mesh import (build_mesh, replicate,
                                                         shard_batch)
    from multimodal_neuroimage_tpu.train.losses import active_losses
    from multimodal_neuroimage_tpu.train.state import (create_train_state,
                                                       make_train_step,
                                                       optimizer_from_config)
    import dataclasses

    cfg = _flagship_cfg()
    cfg = dataclasses.replace(cfg, **cfg_overrides).validate()
    mesh = build_mesh()
    model = create_model(cfg)
    batch = _example_batch(per_chip_batch * jax.local_device_count())
    tx, _ = optimizer_from_config(cfg, steps_per_epoch=100)
    state = create_train_state(model, batch, tx, cfg.seed)
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    specs = active_losses(cfg.task, cfg.fine_tune_task)
    step = make_train_step(model, specs, compute_dtype=cfg.compute_dtype,
                           mesh=mesh)
    dev_batch = shard_batch(batch, mesh)
    for _ in range(3):
        state, losses, _ = step(state, dev_batch)
        float(losses["total"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, losses, _ = step(state, dev_batch)
        float(losses["total"])     # value fetch = true device sync (axon)
        best = min(best, (time.perf_counter() - t0) / n_steps)
    print(f"{label}: {best*1e3:.1f} ms/step (best of 3 windows)", flush=True)
    return best


def main():
    full = step_time({}, "full (bert16x2 + fusion 6/2/6)")
    no_bert = step_time({"transformer_hidden_layers": 1}, "bert depth 1")
    # full-length tuples: swinfusion_net zips depths with heads, so a
    # length-1 tuple would build ONE stage instead of all stages at depth 1
    no_fusion = step_time({"fusion_ex_depths": (1, 1),
                           "fusion_depths": (1, 1, 1),
                           "fusion_re_depths": (1, 1),
                           "fusion_ex_heads": (6, 6),
                           "fusion_heads": (6, 6, 6),
                           "fusion_re_heads": (6, 6)},
                          "fusion depth 1/1/1")
    print(f"BERT stacks   ~{(full-no_bert)*1e3:.1f} ms")
    print(f"fusion stacks ~{(full-no_fusion)*1e3:.1f} ms")
    print(f"residual      ~{(no_bert+no_fusion-full)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
