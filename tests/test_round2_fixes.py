"""Round-2 wiring fixes: perceptual loss, weight_loader phase keying,
partial eval batches, grad-norm observability, HPO best-params reload and
multi-process coordination helpers."""

import dataclasses
import os
import pickle
import time

import jax
import numpy as np
import pytest

from multimodal_neuroimage_tpu.config import Config
from multimodal_neuroimage_tpu.data.synthetic import (generate_synthetic_cohort,
                                                      synthetic_config)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cohort_r2"))
    return generate_synthetic_cohort(root, n_subjects=48, seed=11)


# ---------------------------------------------------------------------------
# Perceptual loss wiring (reference loss_writer.py:181-190, losses.py:314-376)
# ---------------------------------------------------------------------------

def test_reconstruction_task_full_loss_set_no_keyerror():
    """A 'reconstruction' task's registered loss set (perceptual +
    reconstruction + intensity) must evaluate without KeyError."""
    from multimodal_neuroimage_tpu.nn.perceptual import PerceptualLoss
    from multimodal_neuroimage_tpu.train.losses import (active_losses,
                                                        compute_losses)
    specs = active_losses("transformer_reconstruction",
                          "binary_classification")
    assert set(specs) == {"perceptual", "reconstruction", "intensity"}
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(2, 8, 8, 4, 6)).astype(np.float32)  # (B,H,W,D,T)
    outputs = {"reconstructed_fmri_sequence": vol + 0.1}
    batch = {"fmri_sequence": vol, "target": np.zeros(2, np.float32)}
    ploss = PerceptualLoss(task="transformer_reconstruction")
    vals = compute_losses(outputs, batch, specs,
                          extra_fns={"perceptual": ploss},
                          rng=jax.random.PRNGKey(0))
    for name in ("perceptual", "reconstruction", "intensity", "total"):
        assert np.isfinite(float(vals[name])), name

    # without the fn the error is explicit, not a bare KeyError dispatch miss
    with pytest.raises(KeyError, match="perceptual"):
        compute_losses(outputs, batch, specs)


def test_perceptual_timeseries_shape():
    """3-D (B, T, E) reconstructions score as one (T, E) image per item."""
    from multimodal_neuroimage_tpu.nn.perceptual import PerceptualLoss
    ploss = PerceptualLoss(task="transformer_reconstruction")
    x = np.random.default_rng(1).normal(size=(2, 16, 12)).astype(np.float32)
    v = ploss(x + 0.5, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(v)) and float(v) > 0
    assert float(ploss(x, x, jax.random.PRNGKey(1))) == 0.0


# ---------------------------------------------------------------------------
# weight_loader phase keying (reference utils.py:95-128)
# ---------------------------------------------------------------------------

def _fake_experiment(base, name, task, target, exp_name, age):
    folder = os.path.join(base, "experiments", name)
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "arguments.pkl"), "wb") as f:
        pickle.dump({"task": task, "target": target, "exp_name": exp_name}, f)
    ckpt = os.path.join(folder, f"{exp_name}_{target}_BEST_val_AUROC.ckpt")
    with open(ckpt, "wb") as f:
        f.write(b"x")
    t = time.time() - age
    os.utime(ckpt, (t, t))
    return ckpt


def test_weight_loader_phase_keying(tmp_path):
    from multimodal_neuroimage_tpu.cli.main import weight_loader
    base = str(tmp_path)
    # decoys: wrong task, wrong target, and a NEWER wrong-everything one
    _fake_experiment(base, "d1", "2DBERT", "sex", "exp", age=50)
    _fake_experiment(base, "d2", "VIT", "ADHD_label", "exp", age=10)
    _fake_experiment(base, "d3", "FuncStruct", "sex", "other", age=5)
    right_old = _fake_experiment(base, "r1", "VIT", "sex", "other", age=100)
    right_new = _fake_experiment(base, "r2", "VIT", "sex", "other", age=40)
    cfg = Config(base_path=base, step=5, task="FuncStruct", target="sex",
                 exp_name="exp")
    # newest matching (task=VIT, target=sex) wins over newer wrong ones
    assert weight_loader(cfg) == right_new
    # same experiment title beats recency
    right_mine = _fake_experiment(base, "r3", "VIT", "sex", "exp", age=200)
    assert weight_loader(cfg) == right_mine
    # step 1 chains from nothing
    assert weight_loader(dataclasses.replace(cfg, step=1)) is None
    # explicit path always wins
    assert weight_loader(dataclasses.replace(
        cfg, model_weights_path="/x.ckpt")) == "/x.ckpt"


# ---------------------------------------------------------------------------
# Eval splits smaller than one global batch (reference dataloaders.py:139
# drops last for train only)
# ---------------------------------------------------------------------------

def test_small_val_split_produces_metrics_and_checkpoint(cohort, tmp_path):
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    # 48 subjects -> val split 7 < batch 8: without pad-and-mask this split
    # yields zero eval steps, no metrics, and no BEST checkpoint ever
    cfg = synthetic_config(
        cohort, dataset_name="sMRI", target="sex", step=3, task="VIT",
        size_of_model="small", batch_size=8, nEpochs=1, workers=2,
        log_grad_norms_every=2,
        experiment_folder=str(tmp_path / "exp"), experiment_title="small_val",
        compute_dtype="float32").validate()
    trainer = Trainer(cfg)
    assert len(trainer.pipeline.splits["val"]) < cfg.batch_size
    metrics = trainer.training()
    assert "val_AUROC" in metrics
    ckpts = os.listdir(cfg.experiment_folder)
    assert any("BEST" in c for c in ckpts)
    # wandb.watch equivalent (reference trainer.py:94-97) — same run, same
    # compile: per-module grad/param norms land in history + CSV
    hist = trainer.writer.metric_history
    norm_keys = [k for k in hist if k.startswith("norm/")]
    assert any(k.startswith("norm/grad/") for k in norm_keys)
    assert any(k.startswith("norm/param/") for k in norm_keys)
    assert "norm/grad/global" in hist
    assert all(np.isfinite(v) for k in norm_keys for v in hist[k])
    with open(os.path.join(cfg.experiment_folder, "full_scores.csv")) as f:
        header = f.readline()
    assert "norm/grad/global" in header


def test_partial_batch_names_masked(cohort, tmp_path):
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    cfg = synthetic_config(
        cohort, dataset_name="sMRI", target="sex", step=3, task="VIT",
        batch_size=8, workers=2).validate()
    pipe = DataPipeline(cfg)
    val_batches = list(pipe.epoch("val", 0, to_device=False))
    n_val = len(pipe.splits["val"])
    assert n_val == 7
    assert len(val_batches) == 1  # one padded batch instead of zero
    batch, names = val_batches[0]
    assert batch["smri"].shape[0] == 8  # static shape kept for XLA
    real = [n for n in names if n is not None]
    assert len(real) == n_val and len(set(real)) == n_val
    # train keeps drop_last (static compiled shape, no padding)
    for _, tr_names in pipe.epoch("train", 0, to_device=False):
        assert all(n is not None for n in tr_names)


# ---------------------------------------------------------------------------
# HPO: gamma in space, best-params reload, coordination helpers
# ---------------------------------------------------------------------------

def test_search_space_covers_gamma():
    from multimodal_neuroimage_tpu.hpo.optuna_harness import SEARCH_SPACE
    assert "lr_gamma" in SEARCH_SPACE  # reference main.py:514-517


def test_best_params_roundtrip(tmp_path):
    from multimodal_neuroimage_tpu.hpo.optuna_harness import (_dump_best,
                                                              apply_best_params)
    folder = str(tmp_path / "study")
    os.makedirs(folder)
    cfg = Config(experiment_folder=folder, lr_init=1e-3, lr_gamma=0.97)
    _dump_best(cfg, {"lr_init": 4.2e-4, "lr_gamma": 0.93,
                     "not_a_field": 1}, 0.8)
    out = apply_best_params(cfg)
    assert out.lr_init == pytest.approx(4.2e-4)
    assert out.lr_gamma == pytest.approx(0.93)
    # missing file -> unchanged config, no crash
    cfg2 = Config(experiment_folder=str(tmp_path / "empty"),
                  use_best_params_from_optuna=True)
    assert apply_best_params(cfg2).lr_init == cfg2.lr_init


def test_broadcast_helpers_single_process():
    from multimodal_neuroimage_tpu.hpo.optuna_harness import (SyncedTrial,
                                                              broadcast_flag,
                                                              broadcast_params)
    assert broadcast_params({"lr_init": 1e-4}) == {"lr_init": 1e-4}
    assert broadcast_flag(True) is True and broadcast_flag(False) is False

    class FakeTrial:
        number = 3
        params = {"lr_init": 1e-4}

        def __init__(self):
            self.reports = {}

        def report(self, v, s):
            self.reports[s] = v

        def should_prune(self):
            return True

    inner = FakeTrial()
    t = SyncedTrial(inner)
    t.report(0.5, 1)
    assert inner.reports == {1: 0.5}
    assert t.should_prune() is True
    follower = SyncedTrial(None)
    follower.report(0.1, 0)  # no-op
    assert follower.should_prune() is False


def test_prune_checkpoint_message_dispatch():
    """_follower_prune_msg: prune flags pass through; an abort or an
    out-of-phase announce (leader moved on after a leader-local failure)
    aborts the trial — the announce is stashed for the follower loop."""
    from multimodal_neuroimage_tpu.hpo import optuna_harness as oh

    assert oh._follower_prune_msg({"kind": "prune", "flag": True}) is True
    assert oh._follower_prune_msg({"kind": "prune", "flag": False}) is False
    with pytest.raises(oh.TrialAborted, match="simulated"):
        oh._follower_prune_msg({"kind": "abort", "reason": "simulated"})
    announce = {"kind": "trial", "stop": False, "params": {"lr_init": 1e-4}}
    with pytest.raises(oh.TrialAborted):
        oh._follower_prune_msg(announce)
    assert oh._pending is announce  # stashed for the announce loop
    oh._pending = None


def test_flattened_optimizer_matches_per_tensor_updates():
    """optax.flatten wrap (config.flatten_optimizer): one flat-vector update
    must be numerically identical to the per-tensor chain (clip + L2-into-
    grad Adam + schedule), including under gradient accumulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from multimodal_neuroimage_tpu.train.state import create_optimizer

    rng = np.random.default_rng(7)
    params = {"a": jnp.asarray(rng.normal(size=(5, 3)), jnp.float32),
              "b": {"w": jnp.asarray(rng.normal(size=(4,)), jnp.float32)}}
    sched = lambda step: 1e-2 / (1.0 + 0.1 * step)

    for accum in (1, 2):
        txs = [create_optimizer("adam", sched, 1e-4, gradient_clipping=True,
                                clip_max_norm=0.5, accumulation_steps=accum,
                                flatten=f) for f in (False, True)]
        states = [tx.init(params) for tx in txs]
        ps = [params, params]
        for step in range(4):
            grads = jax.tree_util.tree_map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape) + step, jnp.float32), params)
            for i, tx in enumerate(txs):
                upd, states[i] = tx.update(grads, states[i], ps[i])
                ps[i] = jax.tree_util.tree_map(lambda p, u: p + u, ps[i], upd)
        flat0 = jax.tree_util.tree_leaves(ps[0])
        flat1 = jax.tree_util.tree_leaves(ps[1])
        for x0, x1 in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                                       rtol=0, atol=1e-6)


def test_autoplan_plan_cache(monkeypatch, tmp_path):
    """A measured-plan cache written by bench.py's race short-circuits the
    canaries on matching hardware and is ignored on different hardware."""
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops import autoplan
    from multimodal_neuroimage_tpu.ops import bert_layer as bl

    cache_file = str(tmp_path / "plan_cache.json")
    # plan winners moved to a committed per-device-kind file in round 4
    # (plans/<kind>.json, autoplan._plans_path); point both lookup paths
    # into the tmp dir so the repo's real plan file cannot interfere
    monkeypatch.setattr(autoplan, "_plans_path", lambda: cache_file)
    monkeypatch.setattr(autoplan, "_LEGACY_PLAN_CACHE",
                        str(tmp_path / "legacy-absent.json"))
    monkeypatch.setattr(autoplan, "_on_tpu", lambda: True)
    monkeypatch.setattr(autoplan, "_device_kind", lambda: "TPU v5e")

    def boom(b):
        raise AssertionError("canary must not run when the cache matches")

    autoplan.save_plan_cache("bp", "loop", {"fusion_ms_per_step": {"bp": 1.0}})
    monkeypatch.setattr(autoplan, "_RESOLVED", False)
    monkeypatch.setattr(autoplan, "_canary_fusion_bp", boom)
    monkeypatch.setattr(autoplan, "_canary_bert_packed", boom)
    monkeypatch.setattr(sf, "_LAYOUT", None)
    monkeypatch.setattr(bl, "_ATTN_PINNED", False)
    monkeypatch.setattr(bl, "_ATTN_MODE", "packed")
    monkeypatch.setattr(bl, "_GRID_PINNED", False)
    monkeypatch.setattr(bl, "_GRID_MODE", "subject")
    monkeypatch.setattr(bl, "_BC_CAP", 8)
    assert autoplan.resolve_plans(8) == ("bp", "loop")

    # different hardware -> cache ignored, canaries decide
    monkeypatch.setattr(autoplan, "_device_kind", lambda: "TPU v4")
    monkeypatch.setattr(autoplan, "_RESOLVED", False)
    monkeypatch.setattr(autoplan, "_canary_fusion_bp", lambda b: None)
    monkeypatch.setattr(autoplan, "_canary_bert_packed", lambda b: None)
    monkeypatch.setattr(sf, "_LAYOUT", None)
    assert autoplan.resolve_plans(8) == ("bpr", "packed")

    # env pins beat the cache
    monkeypatch.setattr(autoplan, "_device_kind", lambda: "TPU v5e")
    monkeypatch.setattr(autoplan, "_RESOLVED", False)
    monkeypatch.setattr(sf, "_LAYOUT", "std")
    monkeypatch.setattr(bl, "_ATTN_PINNED", True)
    monkeypatch.setattr(bl, "_ATTN_MODE", "packed")
    assert autoplan.resolve_plans(8) == ("std", "packed")


def test_autoplan_fallback(monkeypatch, tmp_path):
    """resolve_plans picks the fast plans when the canaries compile and
    falls back (std / loop) when the hardware rejects them."""
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops import autoplan
    from multimodal_neuroimage_tpu.ops import bert_layer as bl

    # isolate from the committed / machine-local measured-plan files
    monkeypatch.setattr(autoplan, "_plans_path",
                        lambda: str(tmp_path / "absent.json"))
    monkeypatch.setattr(autoplan, "_LEGACY_PLAN_CACHE",
                        str(tmp_path / "legacy-absent.json"))

    # canaries succeed -> fast plans
    monkeypatch.setattr(autoplan, "_RESOLVED", False)
    monkeypatch.setattr(autoplan, "_on_tpu", lambda: True)
    monkeypatch.setattr(autoplan, "_canary_fusion_bp", lambda b: None)
    monkeypatch.setattr(autoplan, "_canary_bert_packed", lambda b: None)
    monkeypatch.setattr(sf, "_LAYOUT", None)
    monkeypatch.setattr(bl, "_ATTN_PINNED", False)
    monkeypatch.setattr(bl, "_ATTN_MODE", "packed")
    monkeypatch.setattr(bl, "_GRID_PINNED", False)
    monkeypatch.setattr(bl, "_GRID_MODE", "subject")
    monkeypatch.setattr(bl, "_BC_CAP", 8)
    assert autoplan.resolve_plans(8) == ("bpr", "packed")
    assert bl._GRID_MODE == "batched"   # batched-grid canary passed

    # canaries fail -> conservative plans
    def boom(b):
        raise RuntimeError("Mosaic says no")

    monkeypatch.setattr(autoplan, "_RESOLVED", False)
    monkeypatch.setattr(autoplan, "_canary_fusion_bp", boom)
    monkeypatch.setattr(autoplan, "_canary_bert_packed", boom)
    monkeypatch.setattr(sf, "_LAYOUT", None)
    assert autoplan.resolve_plans(8) == ("std", "loop")
    assert bl._GRID_MODE == "subject"   # batched canary failed too

    # env pins win and skip the canaries entirely
    monkeypatch.setattr(autoplan, "_RESOLVED", False)
    monkeypatch.setattr(sf, "_LAYOUT", "bp")
    monkeypatch.setattr(bl, "_ATTN_PINNED", True)
    monkeypatch.setattr(bl, "_ATTN_MODE", "loop")
    assert autoplan.resolve_plans(8) == ("bp", "loop")

    # idempotent: a second call returns the cached decision
    assert autoplan.resolve_plans(8) == ("bp", "loop")


# ---- review-pass regressions (round 2, second sweep) -------------------------


def test_best_acc_tracked_even_when_auroc_improves(tmp_path):
    """An all-time-best accuracy that coincides with an AUROC improvement
    must still raise the accuracy bar: a later, worse accuracy may not
    claim the BEST_val_accuracy file."""
    from multimodal_neuroimage_tpu.ckpt.checkpoint import (
        BestCheckpointPolicy, load_metadata)
    pol = BestCheckpointPolicy(str(tmp_path), "t", "binary_classification")
    params = {"w": np.zeros(1)}

    def upd(auroc, acc, epoch):
        return pol.update(val_auroc=auroc, val_acc=acc, params=params,
                          opt_state=None, step=epoch, epoch=epoch,
                          metadata={})

    upd(0.6, 0.75, 1)                      # AUROC file, acc bar -> 0.75
    upd(0.7, 0.85, 2)                      # AUROC improves AND best acc
    assert pol.best_acc == 0.85
    p = upd(0.65, 0.80, 3)                 # worse than epoch 2's accuracy
    assert p is None, "0.80 must not beat the tracked 0.85"
    acc_file = os.path.join(str(tmp_path), "t_BEST_val_accuracy.ckpt")
    assert not os.path.exists(acc_file)


def test_bandsplit_unscored_components_honor_filter_type():
    """frequency_domain modes must FFT the component from the CONFIGURED
    filter — the old filt_component recomputed with hardcoded FIR defaults
    regardless of filtering_type/lb_hz/tr_seconds."""
    from multimodal_neuroimage_tpu.data.filters import bandsplit
    rng = np.random.default_rng(3)
    y = rng.normal(size=(4, 200))
    fir = bandsplit(y, "FIR")
    box = bandsplit(y, "Boxcar")
    # unscored low == the filtered high-pass component of THAT filter
    assert not np.allclose(fir["low_unscored"], box["low_unscored"])
    for b in (fir, box):
        np.testing.assert_allclose(
            b["low_unscored"] + b["ultralow_unscored"], y, atol=1e-9)


def test_gather_ragged_single_process_identity():
    from multimodal_neuroimage_tpu.evaluation.metrics import gather_ragged
    v = np.asarray([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(gather_ragged(v), v)
    assert gather_ragged(np.zeros(0)).size == 0


def test_host_local_rows_single_process():
    import jax.numpy as jnp
    from multimodal_neuroimage_tpu.parallel.mesh import host_local_rows
    x = jnp.arange(12.0).reshape(6, 2)
    np.testing.assert_array_equal(host_local_rows(x), np.asarray(x))


def test_device_preprocess_path_applies_augmentation(tmp_path):
    """cfg.preprocess='device' must not silently skip train augmentation:
    the raw series is augmented BEFORE the on-device FIR, like the host
    path augments before preprocess_fmri_host."""
    from multimodal_neuroimage_tpu.data.datasets import ItemLoader
    from multimodal_neuroimage_tpu.data.index import SubjectRecord
    fpath = str(tmp_path / "x.npy")
    np.save(fpath, np.random.default_rng(0).normal(size=(84, 360)))
    rec = SubjectRecord(idx=0, subject="s", paths={"fmri": fpath},
                        target=1.0)
    cfg = Config(dataset_name="fMRI_timeseries", target="sex",
                 fmri_type="divided_frequency", preprocess="device",
                 augment_prob=1.0).validate()
    plain = ItemLoader(cfg, augment=False)(rec)
    auged = ItemLoader(cfg, augment=True)(rec)
    assert set(plain) == set(auged)
    assert not np.allclose(plain["fmri_raw"], auged["fmri_raw"])


def test_device_path_disabled_for_boxcar():
    """The fused device kernel implements only the FIR split; Boxcar must
    fall back to the host path (which implements it) instead of silently
    FIR-filtering."""
    from multimodal_neuroimage_tpu.data.datasets import ItemLoader
    fir_cfg = Config(dataset_name="fMRI_timeseries", target="sex",
                     fmri_type="divided_frequency",
                     preprocess="device").validate()
    box_cfg = dataclasses.replace(fir_cfg, filtering_type="Boxcar")
    assert ItemLoader(fir_cfg).device_fmri
    assert not ItemLoader(box_cfg).device_fmri


def test_hcp_nan_metadata_rows_dropped(tmp_path):
    from multimodal_neuroimage_tpu.data.index import build_hcp_index
    hcp = tmp_path / "hcp"
    hcp.mkdir()
    for s in ("100001", "100002", "100003"):
        np.save(str(hcp / f"{s}_cortex.npy"), np.zeros((22, 8)))
    meta_dir = tmp_path / "data" / "metadata"
    meta_dir.mkdir(parents=True)
    import pandas as pd
    pd.DataFrame({"subject": [100001, 100002, 100003],
                  "age": [10.0, np.nan, 12.0]}).to_csv(
        meta_dir / "HCP_1200_precise_age.csv", index=False)
    pd.DataFrame({"Subject": [100001, 100002],
                  "Gender": ["M", np.nan]}).to_csv(
        meta_dir / "HCP_1200_gender.csv", index=False)
    cfg = Config(dataset_name="hcp", target="age",
                 fine_tune_task="regression",
                 base_path=str(tmp_path), hcp_path=str(hcp)).validate()
    recs = build_hcp_index(cfg)
    assert [r.subject for r in recs] == ["100001", "100003"]
    assert all(np.isfinite(r.target) for r in recs)
    lax = build_hcp_index(cfg, require_target=False)
    assert [r.subject for r in lax] == ["100001", "100002", "100003"]
    # NaN gender must not silently encode as female
    cfg_sex = dataclasses.replace(cfg, target="sex",
                                  fine_tune_task="binary_classification")
    recs_sex = build_hcp_index(cfg_sex)
    assert [r.subject for r in recs_sex] == ["100001"]
