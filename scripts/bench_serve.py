"""Serving-throughput benchmark: flagship deterministic forward,
subjects/sec/chip.

Complements bench.py (train step) with the production-inference number:
the Predictor's jitted forward (no backward, no optimizer) at a given
per-chip batch. Timing discipline matches bench.py: value-fetch sync on
the tunneled backend, varied inputs per step so executions cannot be
deduped, best-of-windows.

Usage: [BENCH_PER_CHIP_BATCH=8] python scripts/bench_serve.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def main() -> None:
    from __graft_entry__ import _example_batch, _flagship_cfg
    from multimodal_neuroimage_tpu.models.registry import create_model
    from multimodal_neuroimage_tpu.ops.autoplan import resolve_plans
    from multimodal_neuroimage_tpu.parallel.mesh import (build_mesh,
                                                         replicate,
                                                         shard_batch)
    from multimodal_neuroimage_tpu.serve.predictor import make_predict_step

    n_chips = jax.local_device_count()
    platform = jax.devices()[0].platform
    per_chip = int(os.environ.get("BENCH_PER_CHIP_BATCH", "8"))
    batch_size = per_chip * n_chips

    cfg = _flagship_cfg(tiny=(platform == "cpu"))
    resolve_plans(per_chip)
    mesh = build_mesh()
    model = create_model(cfg)
    batch = _example_batch(batch_size, r=cfg.intermediate_vec)
    params = model.init(jax.random.PRNGKey(0), batch,
                        deterministic=True)["params"]
    params = replicate(params, mesh)
    step = make_predict_step(model, cfg.compute_dtype, mesh=mesh)
    head = "binary_classification"

    # a few input variants so the tunnel cannot dedupe repeated executions
    variants = []
    for i in range(4):
        v = {k: np.asarray(a) + 1e-3 * i for k, a in batch.items()}
        variants.append(shard_batch(v, mesh))

    out = step(params, variants[0])[head]
    assert np.isfinite(float(out.sum()))                # compile + sync

    n_steps = int(os.environ.get("BENCH_STEPS", "25"))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        refs = [step(params, variants[i % 4])[head] for i in range(n_steps)]
        float(refs[-1].sum())                           # value-fetch sync
        best = min(best, time.perf_counter() - t0)
        assert all(np.isfinite(float(r.sum())) for r in refs)

    per_sec = batch_size * n_steps / best / n_chips
    print(json.dumps({
        "metric": "serve_forward_subjects_per_sec_per_chip",
        "value": round(per_sec, 3),
        "unit": f"subjects/sec/chip ({platform}, bs={per_chip}/chip, "
                f"deterministic forward, Func_Struct_Cross)",
    }))


if __name__ == "__main__":
    main()
