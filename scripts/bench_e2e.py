"""End-to-end epoch throughput: Trainer.train_epoch WITH the input pipeline.

bench.py times pre-staged device tensors; the north star (BASELINE.json)
says "preprocessing must saturate the input pipeline so TPU step time is
compute-bound" — this script is the measurement of that clause (VERDICT r4
next #4; reference trainer.py:304, 337-339 epoch wall protocol).

Generates an on-disk synthetic multimodal cohort, then runs the flagship
Func_Struct_Cross `Trainer.train_epoch` at bs=64/chip in each preprocess
gear:

  device — raw timeseries shipped to HBM, FIR band-split + zscore fused
           into the jitted step (data/loader.device_preprocess)
  native — C++ fastpipe worker pool does the preprocessing on host
  host   — reference-equivalent numpy path (datasets.py:272-307 semantics)

For each gear it reports subjects/sec with the pipeline in the loop, plus
two reference rows measured once: pipeline-only subjects/sec (iterate the
epoch without stepping — the host ceiling) and step-only subjects/sec
(pre-staged batch, bench.py-style — the device ceiling). The verdict line
compares e2e against the device ceiling: >=90% means the step is
compute-bound in that gear on this host.

CAVEAT recorded in the output: this image has ONE usable host core; the
reference ran 8-worker DataLoaders (dataloaders.py:136). Host-bound gears
are expected to fall far short here, and that is a statement about the
host, not the framework; the `device` gear is the TPU-native answer.

Usage: python scripts/bench_e2e.py [--subjects N] [--batch B] [--epochs K]
Prints one JSON line per gear and a final summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def _cfg(root: str, exp: str, batch: int, epochs: int, preprocess: str,
         workers: int, tiny: bool):
    from multimodal_neuroimage_tpu.data.synthetic import synthetic_config
    kw = dict(task="FuncStruct", dataset_name="multimodal",
              multimodality_type="cross_attention", target="sex",
              fine_tune_task="binary_classification",
              fmri_type="divided_frequency",
              batch_size=batch, nEpochs=epochs, workers=workers,
              preprocess=preprocess, experiment_folder=exp,
              experiment_title=f"e2e_{preprocess}", seed=55555555,
              validation_frequency=10 ** 9)
    if tiny:
        kw.update(transformer_hidden_layers=2, bert_intermediate_size=128,
                  fusion_ex_depths=(1,), fusion_depths=(1,),
                  fusion_re_depths=(1,), fusion_ex_heads=(2,),
                  fusion_heads=(2,), fusion_re_heads=(2,),
                  size_of_model="small", num_heads_2DBert=4)
    return synthetic_config(root, **kw).validate()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=420)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--gears", default="device,native,host")
    ap.add_argument("--root", default=None,
                    help="reuse an existing synthetic cohort dir")
    args = ap.parse_args()

    from multimodal_neuroimage_tpu.data.synthetic import (
        generate_synthetic_cohort)
    from multimodal_neuroimage_tpu.ops.autoplan import resolve_plans

    platform = jax.devices()[0].platform
    tiny = platform == "cpu"
    resolve_plans(args.batch)

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    root = args.root or os.path.join(tmp, "cohort")
    if not os.path.isdir(os.path.join(root, "data")):
        t0 = time.monotonic()
        generate_synthetic_cohort(root, n_subjects=args.subjects, seed=7)
        print(f"[e2e] cohort of {args.subjects} subjects generated in "
              f"{time.monotonic() - t0:.1f}s at {root}", flush=True)

    results = {}
    for gear in args.gears.split(","):
        from multimodal_neuroimage_tpu.train.trainer import Trainer
        cfg = _cfg(root, os.path.join(tmp, f"exp_{gear}"), args.batch,
                   args.epochs, gear, workers=0 if gear == "device" else 2,
                   tiny=tiny)
        try:
            tr = Trainer(cfg)
        except Exception as e:
            print(f"[e2e] gear {gear} unavailable: "
                  f"{type(e).__name__}: {e}"[:300], flush=True)
            continue
        steps = tr.pipeline.steps_per_epoch("train")
        subjects = steps * cfg.batch_size

        # pipeline-only ceiling: walk one epoch without stepping (device
        # transfer included — this is "what the host can deliver")
        t0 = time.monotonic()
        n = 0
        for batch, names in tr.pipeline.epoch("train", 0):
            jax.block_until_ready(batch["target"])
            n += len(names)
        pipe_sps = n / (time.monotonic() - t0)

        # step-only ceiling: bench.py-style, one cached batch. The jitted
        # step DONATES the state buffers, so thread the advanced state back
        # onto the trainer afterwards (the old tr.state buffers are gone).
        batch, _ = next(tr.pipeline.epoch("train", 0, shuffle=False))
        state = tr.state
        for _ in range(2):                         # compile + settle
            state, losses, _ = tr.train_step(state, batch)
        float(losses["total"])
        t0 = time.perf_counter()
        for _ in range(max(steps, 4)):
            state, losses, _ = tr.train_step(state, batch)
        float(losses["total"])
        step_sps = max(steps, 4) * cfg.batch_size / (time.perf_counter() - t0)
        tr.state = state

        # e2e epochs: epoch 0 pays residual compiles; time epochs >= 1
        tr.train_epoch(0)
        tr._flush_pending()
        walls = []
        for ep in range(1, cfg.nEpochs):
            t0 = time.monotonic()
            tr.train_epoch(ep)
            tr._flush_pending()
            walls.append(time.monotonic() - t0)
        e2e_sps = subjects / min(walls) if walls else float("nan")

        row = {
            "gear": gear,
            "e2e_subjects_per_sec": round(e2e_sps, 2),
            "pipeline_only_subjects_per_sec": round(pipe_sps, 2),
            "step_only_subjects_per_sec": round(step_sps, 2),
            "steps_per_epoch": steps,
            "compute_bound_pct": round(100 * e2e_sps / step_sps, 1),
        }
        results[gear] = row
        print(json.dumps(row), flush=True)

    best = max(results.values(), key=lambda r: r["e2e_subjects_per_sec"],
               default=None)
    summary = {
        "metric": "e2e_train_epoch_subjects_per_sec",
        "value": best["e2e_subjects_per_sec"] if best else None,
        "unit": f"subjects/sec ({platform}, bs={args.batch}, "
                f"Trainer.train_epoch incl. input pipeline)",
        "best_gear": best["gear"] if best else None,
        "host_cores_caveat": "1-core image; reference used 8-worker loaders",
        "gears": results,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
