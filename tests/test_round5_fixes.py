"""Round-5 fixes: bench output discipline (VERDICT r4 #1) and plan-file
race-record merging (VERDICT r4 weak #2)."""

import json
import subprocess
import sys

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# bench.py output discipline
# ---------------------------------------------------------------------------


def _bench():
    import importlib
    import bench
    return importlib.reload(bench)


def test_err_truncates_and_flattens():
    """Exception rendering is bounded and newline-free — a multi-KB XLA OOM
    report must not be able to flush the result JSON out of the driver's
    tail capture (the round-4 failure mode)."""
    bench = _bench()
    huge = RuntimeError("Ran out of memory\n" + "x" * 50_000 + "\n" * 100)
    s = bench._err(huge)
    assert len(s) <= 300
    assert "\n" not in s
    assert s.startswith("RuntimeError: Ran out of memory")


def test_say_reprints_last_result(capsys):
    """Once a result exists, every chatter line is followed by a re-print of
    the latest result JSON, so the last stdout line is always valid JSON."""
    bench = _bench()
    bench._say("[bench] chatter before any result")
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["[bench] chatter before any result"]

    bench._emit({"metric": "m", "value": 1.0})
    bench._say("[bench] some race leg failed (RuntimeError: boom)")
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {"metric": "m", "value": 1.0}
    assert out[-2].startswith("[bench] some race leg")


def test_emit_updates_last_result(capsys):
    bench = _bench()
    bench._emit({"value": 1})
    bench._emit({"value": 2})
    bench._say("x")
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {"value": 2}


@pytest.mark.skipif("RUN_SLOW_BENCH_TEST" not in __import__("os").environ,
                    reason="multi-minute subprocess compile; set "
                           "RUN_SLOW_BENCH_TEST=1 to run")
def test_bench_sigterm_leaves_json_last(tmp_path):
    """A SIGTERM (the driver's timeout kill — BENCH_r03 was rc=124) after
    the provisional window still leaves valid JSON as the last stdout line.
    Uses `timeout` against a tiny CPU bench run."""
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_STEPS="1",
               BENCH_WINDOWS="1", BENCH_ROTATE="1", BENCH_PER_CHIP_BATCH="1")
    # run under coreutils timeout so the parent sends SIGTERM mid-run; the
    # handler must still print the JSON. Window must be long enough for the
    # compile (~2-4 min cold on CPU) — use the persistent jax cache dir.
    proc = subprocess.run(
        ["timeout", "--signal=TERM", "600", sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    assert lines, proc.stderr[-2000:]
    json.loads(lines[-1])  # last line must parse


# ---------------------------------------------------------------------------
# save_plan_cache merges race records per leg (never clobbers)
# ---------------------------------------------------------------------------


def test_save_plan_cache_merges_race_legs(tmp_path, monkeypatch):
    from multimodal_neuroimage_tpu.ops import autoplan

    monkeypatch.setattr(autoplan, "_REPO_ROOT", str(tmp_path))
    monkeypatch.setattr(autoplan, "_LEGACY_PLAN_CACHE",
                        str(tmp_path / ".plan_cache.json"))
    monkeypatch.setattr(autoplan, "_device_kind", lambda: "TPU v5 lite")

    # full race writes three legs
    autoplan.save_plan_cache("bp", "packed", {
        "fusion_ms_per_step": {"bp": 712.8, "bpr": 716.3},
        "bert_ms_per_step": {"packed": 711.9, "loop": 716.2},
    }, bert_grid="batched", bert_bc=4)

    # a later partial re-race (rehearsal that only fit one leg) must MERGE:
    # the bp value updates, bpr and the whole bert leg survive
    autoplan.save_plan_cache("bp", "packed", {
        "fusion_ms_per_step": {"bp": 711.5},
    }, bert_grid="batched", bert_bc=4)

    with open(tmp_path / "plans" / "tpu_v5_lite.json") as f:
        cache = json.load(f)
    assert cache["race"]["fusion_ms_per_step"] == {"bp": 711.5, "bpr": 716.3}
    assert cache["race"]["bert_ms_per_step"] == {"packed": 711.9,
                                                 "loop": 716.2}


# ---------------------------------------------------------------------------
# legacy-checkpoint optimizer-state recovery (round-4 advisor, medium)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    from multimodal_neuroimage_tpu.data.synthetic import (
        generate_synthetic_cohort)
    root = str(tmp_path_factory.mktemp("cohort"))
    return generate_synthetic_cohort(root, n_subjects=48, seed=7)


def _cfg(cohort, tmp_path, **kw):
    from multimodal_neuroimage_tpu.data.synthetic import synthetic_config
    base = dict(dataset_name="sMRI", target="sex", step=3, task="VIT",
                size_of_model="small", batch_size=4, nEpochs=1, workers=0,
                lr_init=1e-3, lr_policy="step", lr_step=50,
                experiment_folder=str(tmp_path / "exp"),
                experiment_title="r5", compute_dtype="float32")
    base.update(kw)
    return synthetic_config(cohort, **base).validate()


def test_legacy_opt_state_resumes_unfused(cohort, tmp_path, capsys):
    """A checkpoint written by the pre-round-4 (unfused optax) optimizer,
    resumed under fused_optimizer='auto', must NOT silently restart Adam
    moments: the trainer falls back to the unfused chain and restores the
    moments + schedule count intact."""
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = _cfg(cohort, tmp_path, fused_optimizer="off")
    Trainer(cfg).training()

    cfg2 = _cfg(cohort, tmp_path, nEpochs=2, fused_optimizer="auto")
    resumed = Trainer(cfg2)
    out = capsys.readouterr().out
    assert "legacy (unfused) optimizer state detected" in out
    assert resumed.epoch0 == 1
    # the restored inner step count is non-zero (moments resumed, not fresh)
    import jax
    leaves = jax.tree_util.tree_leaves(resumed.state.opt_state)
    assert any(getattr(l, "ndim", None) == 0 and int(l) > 0 for l in leaves)


def test_incompatible_opt_state_fails_loudly(cohort, tmp_path):
    """When neither the current nor the legacy optimizer matches the
    checkpoint, resume must raise unless fresh_opt_state=True opts in."""
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = _cfg(cohort, tmp_path, optim="adam")
    Trainer(cfg).training()

    # different optimizer family -> neither template matches
    bad = _cfg(cohort, tmp_path, nEpochs=2, optim="adamw",
               accumulation_steps=2)
    with pytest.raises(RuntimeError, match="incompatible"):
        Trainer(bad)

    ok = _cfg(cohort, tmp_path, nEpochs=2, optim="adamw",
              accumulation_steps=2, fresh_opt_state=True)
    t = Trainer(ok)
    assert t.epoch0 == 1  # params/step resumed, optimizer restarted


def test_transition_permutation_usable_across_traces(monkeypatch):
    """transition_permutation_fn's cached closure must hold NUMPY index
    planes: a jnp array created while a jit trace is active is trace-bound
    on jax 0.9, and caching one leaks it into later traces — the round-5
    bpr race regression ('No constant handler for DynamicJaxprTracer' when
    bpr traced after any other layout in one process). Regression: create
    the permutation INSIDE one jit trace, then use it inside a second."""
    import jax
    import jax.numpy as jnp
    from multimodal_neuroimage_tpu.nn import common

    common.transition_permutation_fn.cache_clear()
    H = W = 12

    @jax.jit
    def first(x):
        p = common.transition_permutation_fn(H, W, 6, 0, 3, 40, axis=1)
        return p(x).sum()

    @jax.jit
    def second(x):
        p = common.transition_permutation_fn(H, W, 6, 0, 3, 40, axis=1)
        return jax.grad(lambda t: p(t).sum() ** 2)(x)

    x = jnp.ones((2, 4 * 40, 8), jnp.float32)
    first(x)
    out = second(x)          # cache hit from inside a DIFFERENT trace
    assert np.all(np.isfinite(np.asarray(out)))


def test_save_plan_cache_ignores_foreign_device_race(tmp_path, monkeypatch):
    """Race records from a DIFFERENT hardware class are not merged in."""
    from multimodal_neuroimage_tpu.ops import autoplan

    monkeypatch.setattr(autoplan, "_REPO_ROOT", str(tmp_path))
    monkeypatch.setattr(autoplan, "_LEGACY_PLAN_CACHE",
                        str(tmp_path / ".plan_cache.json"))
    monkeypatch.setattr(autoplan, "_device_kind", lambda: "TPU v4")
    autoplan.save_plan_cache("std", "loop",
                             {"fusion_ms_per_step": {"std": 1.0}})

    # same file path would only collide if _plans_path matched; simulate a
    # stale file of another kind at THIS kind's path
    path = tmp_path / "plans" / "tpu_v4.json"
    data = json.loads(path.read_text())
    data["device_kind"] = "TPU v9"
    path.write_text(json.dumps(data))

    autoplan.save_plan_cache("bp", "packed",
                             {"bert_ms_per_step": {"packed": 2.0}})
    cache = json.loads(path.read_text())
    # foreign race dict was dropped, new leg present
    assert cache["race"] == {"bert_ms_per_step": {"packed": 2.0}}
    assert cache["device_kind"] == "TPU v4"
