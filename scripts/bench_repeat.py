"""Variance-aware flagship step timing: one compile, K repeated measurements.

The axon tunnel's per-dispatch latency varies between runs; single 12-20 step
windows scatter wildly (measured 11 ms vs 276 ms for identical programs).
This script compiles once and reports per-window times so the floor (best
window) and the jitter are both visible.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def main():
    if os.environ.get("BENCH_DISABLE_FUSED"):
        from multimodal_neuroimage_tpu.ops.attention import set_fused_attention
        set_fused_attention(False)
        print("fused kernels DISABLED (plain XLA paths)", flush=True)
    from __graft_entry__ import _example_batch, _flagship_cfg
    from multimodal_neuroimage_tpu.models.registry import create_model
    from multimodal_neuroimage_tpu.parallel.mesh import (build_mesh, replicate,
                                                         shard_batch)
    from multimodal_neuroimage_tpu.train.losses import active_losses
    from multimodal_neuroimage_tpu.train.state import (create_train_state,
                                                       make_train_step,
                                                       optimizer_from_config)

    per_chip_batch = int(os.environ.get("BENCH_PER_CHIP_BATCH", "8"))
    batch_size = per_chip_batch * jax.local_device_count()
    cfg = _flagship_cfg()
    mesh = build_mesh()
    model = create_model(cfg)
    batch = _example_batch(batch_size)
    tx, _ = optimizer_from_config(cfg, steps_per_epoch=100)
    state = create_train_state(model, batch, tx, cfg.seed)
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    specs = active_losses(cfg.task, cfg.fine_tune_task)
    step = make_train_step(model, specs, compute_dtype=cfg.compute_dtype,
                           mesh=mesh)
    dev_batch = shard_batch(batch, mesh)

    t0 = time.perf_counter()
    for _ in range(3):
        state, losses, _ = step(state, dev_batch)
        float(losses["total"])
    print(f"warmup done in {time.perf_counter()-t0:.1f}s", flush=True)

    # sync by VALUE FETCH: on the axon backend block_until_ready returns
    # optimistically before the device work completes
    windows = []
    for w in range(4):
        n = 25
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses, _ = step(state, dev_batch)
        float(losses["total"])
        dt = (time.perf_counter() - t0) / n
        windows.append(dt)
        print(f"window {w}: {dt*1e3:.1f} ms/step "
              f"({batch_size/dt:.1f} subj/s)", flush=True)
    best = min(windows)
    print(f"best window: {best*1e3:.1f} ms/step = "
          f"{batch_size/best:.1f} subj/s/chip", flush=True)


if __name__ == "__main__":
    main()
