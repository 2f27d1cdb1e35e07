"""Capture a jax.profiler device trace of the fusion micro-bench (or the
full flagship step) and print per-kernel time aggregated from the raw
xplane.pb — the tensorboard converter in this image is broken, so the
XSpace proto (tensorflow.tsl.profiler.protobuf.xplane_pb2) is parsed
directly.

Usage:
    python scripts/profile_step.py micro [self|cross]   # d8 kernel stack
    python scripts/profile_step.py step                 # full train step
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def _self_times(events):
    """Per-event SELF duration for one trace line: duration minus the
    durations of DIRECT children (events strictly contained in it on the
    same line). Raw-duration sums double-count nesting — e.g. a scanned
    `while` shell re-reports every kernel call it contains, which muddied
    the round-4 bs=64 attribution (ROADMAP)."""
    evs = sorted(events, key=lambda e: (e.offset_ps, -e.duration_ps))
    self_ps = {}
    stack = []          # (end_ps, id) of currently open ancestors
    for i, ev in enumerate(evs):
        start, end = ev.offset_ps, ev.offset_ps + ev.duration_ps
        while stack and stack[-1][0] <= start:
            stack.pop()
        self_ps[i] = ev.duration_ps
        if stack:
            self_ps[stack[-1][1]] -= ev.duration_ps   # direct parent only
        stack.append((end, i))
    return evs, self_ps


def summarize(logdir: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        total = defaultdict(float)
        count = defaultdict(int)
        for line in plane.lines:
            evs, self_ps = _self_times(line.events)
            for i, ev in enumerate(evs):
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                total[name] += max(self_ps[i], 0) / 1e9    # ms, self time
                count[name] += 1
        if not total:
            continue
        print(f"== plane: {plane.name} "
              f"(total {sum(total.values()):.2f} ms SELF across lines) ==")
        for name, ms in sorted(total.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms:9.3f} ms  x{count[name]:<5d} {name[:100]}")

        # family rollup (the attribution table the round reviews read):
        # which band of the step each op belongs to, ms summed per family
        def family(name: str) -> str:
            if name.startswith("jit_") or name in ("0", "1"):
                return "(step shells — excluded)"
            n = name.lstrip("%")
            if n.startswith(("block_0", "block_1")):
                return "fusion block kernels"
            if n.startswith("layer."):
                return "BERT megakernels"
            if n.startswith(("kernel", "fused_adam", "update")):
                return "optimizer"
            if n.startswith("copy-start"):
                return "copy-start (DMA queue, mostly overlapped)"
            if n.startswith(("copy", "transpose", "reshape", "bitcast")):
                return "reshape/copy glue"
            if n.startswith(("while", "dynamic-update", "dynamic-slice",
                             "slice")):
                return "scan shells / slices"
            if n.startswith(("fusion", "add", "multiply", "select",
                             "broadcast", "convert", "reduce", "iota",
                             "concatenate", "pad", "compare", "gather",
                             "scatter")):
                return "XLA fusions / small ops"
            return "other"

        fam_ms = defaultdict(float)
        for name, ms in total.items():
            fam_ms[family(name)] += ms
        print("-- family rollup (SELF ms across the traced window) --")
        for fam, ms in sorted(fam_ms.items(), key=lambda kv: -kv[1]):
            print(f"  {ms:9.1f} ms  {fam}")


def run_micro(which: str):
    from scripts.bench_fusion_micro import stack_fn
    fn, x = stack_fn(8, cross=(which == "cross"), train=True)
    seed = jnp.asarray(1, jnp.int32)
    float(fn(x, seed))                     # compile
    logdir = tempfile.mkdtemp(prefix="prof_")
    with jax.profiler.trace(logdir):
        v = fn(x + 1e-6, seed)
        float(v)
    summarize(logdir)


def run_step():
    import time
    from __graft_entry__ import _example_batch, _flagship_cfg
    from multimodal_neuroimage_tpu.models.registry import create_model
    from multimodal_neuroimage_tpu.ops.autoplan import resolve_plans
    from multimodal_neuroimage_tpu.parallel.mesh import (build_mesh,
                                                         replicate,
                                                         shard_batch)
    from multimodal_neuroimage_tpu.train.losses import active_losses
    from multimodal_neuroimage_tpu.train.state import (create_train_state,
                                                       make_train_step,
                                                       optimizer_from_config)
    t0 = time.perf_counter()

    def mark(what):
        print(f"[{time.perf_counter() - t0:7.1f}s] {what}", flush=True)

    bs = int(os.environ.get("BENCH_PER_CHIP_BATCH", "8"))
    cfg = _flagship_cfg()
    resolve_plans(bs)
    mark(f"plans resolved (bs={bs}/chip)")
    mesh = build_mesh()
    model = create_model(cfg)
    batch = _example_batch(bs * jax.local_device_count())
    tx, _ = optimizer_from_config(cfg, steps_per_epoch=100)
    state = create_train_state(model, batch, tx, cfg.seed)
    mark("state initialized")
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    specs = active_losses(cfg.task, cfg.fine_tune_task)
    step = make_train_step(model, specs, compute_dtype=cfg.compute_dtype,
                           mesh=mesh)
    dev_batch = shard_batch(batch, mesh)
    for i in range(3):
        state, losses, _ = step(state, dev_batch)
        float(losses["total"])
        mark(f"warmup step {i} done")
    logdir = tempfile.mkdtemp(prefix="prof_")
    with jax.profiler.trace(logdir):
        for _ in range(2):
            state, losses, _ = step(state, dev_batch)
        float(losses["total"])
    mark(f"trace captured -> {logdir}")
    summarize(logdir, top=40)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "micro"
    if mode == "micro":
        run_micro(sys.argv[2] if len(sys.argv) > 2 else "self")
    else:
        run_step()
