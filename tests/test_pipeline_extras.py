"""Pipeline extras: device-side FIR band-split path, CLI config resolution,
GBT baseline, HPO fallback."""

import os

import numpy as np
import pytest

from multimodal_neuroimage_tpu.data.synthetic import (generate_synthetic_cohort,
                                                      synthetic_config)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    return generate_synthetic_cohort(
        str(tmp_path_factory.mktemp("cohort2")), n_subjects=24, seed=3)


def test_device_preprocess_matches_host(cohort):
    """cfg.preprocess='device' (fused on-TPU FIR) must reproduce the host
    pipeline's band outputs (datasets.py:272-307 semantics)."""
    from multimodal_neuroimage_tpu.data.loader import DataPipeline, device_preprocess
    from multimodal_neuroimage_tpu.parallel.mesh import build_mesh

    base = dict(dataset_name="multimodal", fmri_type="divided_frequency",
                target="sex", batch_size=2, workers=1)
    cfg_host = synthetic_config(cohort, preprocess="host", **base).validate()
    cfg_dev = synthetic_config(cohort, preprocess="device", **base).validate()

    host_pipe = DataPipeline(cfg_host)
    dev_pipe = DataPipeline(cfg_dev)
    hb, hn = next(host_pipe.epoch("train", 0, shuffle=False, to_device=False))
    db, dn = next(dev_pipe.epoch("train", 0, shuffle=False, to_device=False))
    assert hn == dn
    out = device_preprocess(db, cfg_dev)
    for key in ("fmri_raw_sequence", "fmri_lowfreq_sequence",
                "fmri_ultralowfreq_sequence"):
        np.testing.assert_allclose(np.asarray(out[key]), hb[key],
                                   atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["struct"]), hb["struct"],
                               atol=1e-3)


def test_cli_config_resolution(cohort, tmp_path):
    from multimodal_neuroimage_tpu.cli.main import config_from_args
    cfg = config_from_args([
        "--step", "3", "--dataset_name", "sMRI", "--target", "sex",
        "--base_path", cohort, "--no-gradient_clipping",
        "--size_of_model", "small"])
    assert cfg.task == "VIT"
    assert cfg.batch_size == 4          # phase-3 default (main.py:245-263)
    assert cfg.optim == "Adam"
    assert cfg.lr_init == 1e-4
    cfg6 = config_from_args(["--step", "6", "--dataset_name", "struct"])
    assert cfg6.task == "SwinFusion"
    assert cfg6.fusion_drop_rate == 0.8  # SwinFusion class default


@pytest.mark.slow
def test_gbt_baseline_runs(cohort):
    from baselines.gbt_baseline import main
    # shrink grid for test speed
    import baselines.gbt_baseline as gb
    old = dict(gb.GRID)
    gb.GRID = {k: v[:1] for k, v in old.items()}
    try:
        out = main(["--root", cohort, "--target", "sex",
                    "--modality", "smri", "--fold", "3"])
    finally:
        gb.GRID = old
    assert 0.0 <= out["test_AUROC"] <= 1.0


def test_hpo_fallback_trial_pruning():
    """MedianPruner semantics (reference main.py:453): pruning only engages
    after n_startup_trials COMPLETED trials; then a below-median trial is
    pruned (fuller coverage in tests/test_round3_hpo_cli.py)."""
    from multimodal_neuroimage_tpu.hpo.optuna_harness import _FallbackTrial
    import numpy as np
    rng = np.random.default_rng(0)
    history, completed = {}, set()
    for n in range(_FallbackTrial.N_STARTUP_TRIALS):
        t = _FallbackTrial(n, rng, history, maximize=True,
                           completed=completed)
        t.report(0.8 + 0.02 * n, 0)
        completed.add(n)
    t2 = _FallbackTrial(9, rng, history, maximize=True, completed=completed)
    t2.report(0.1, 0)
    assert t2.should_prune()           # well below the median of peers
    v = t2.suggest_float("lr", 1e-5, 1e-3, log=True)
    assert 1e-5 <= v <= 1e-3
    c = t2.suggest_categorical("bs", [4, 8])
    assert c in (4, 8)


def test_schedules_shapes():
    from multimodal_neuroimage_tpu.train.schedules import build_schedule
    import numpy as np
    for policy in ("step", "SGDR", "OneCycle", "CosAnn"):
        fn = build_schedule(policy, 1e-3, 1000, lr_step=100, lr_gamma=0.5,
                            lr_warmup=50)
        vals = [float(fn(t)) for t in (0, 10, 100, 500, 999)]
        assert all(np.isfinite(v) and v >= 0 for v in vals), (policy, vals)
    # step decay floors at 1e-7 (learning_rate.py:44-48)
    fn = build_schedule("step", 1e-6, 10_000, lr_step=1, lr_gamma=0.1)
    assert float(fn(100)) == pytest.approx(1e-7)


def test_multimodal_prs_pipeline(cohort):
    """PRS dataset path: 'prs' (B, 3) z-scored vector rides the batch
    (datasets.py:706-835)."""
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    cfg = synthetic_config(cohort, dataset_name="multimodal_prs",
                           fmri_type="divided_frequency", target="sex",
                           batch_size=2, workers=1,
                           preprocess="host").validate()
    pipe = DataPipeline(cfg)
    batch, names = next(pipe.epoch("train", 0, shuffle=False, to_device=False))
    assert batch["prs"].shape == (2, 3)
    assert batch["struct"].shape == (2, 84, 84)
    assert batch["fmri_ultralowfreq_sequence"].shape == (2, 368, 84)


@pytest.mark.parametrize("fmri_type,key,tlen", [
    ("frequency", "fmri_sequence", 184),
    ("time_domain_low", "fmri_sequence", 368),
    ("timeseries_and_frequency", "fmri_ultralowfreq_sequence", 184),
])
def test_fmri_type_modes_through_loader(cohort, fmri_type, key, tlen):
    """The frequency-domain and mixed fmri_type modes (datasets.py:233-365)
    produce their contract shapes through the real loader."""
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    cfg = synthetic_config(cohort, dataset_name="fMRI_timeseries",
                           fmri_type=fmri_type, target="sex", batch_size=2,
                           workers=1, preprocess="host").validate()
    pipe = DataPipeline(cfg)
    batch, _ = next(pipe.epoch("train", 0, shuffle=False, to_device=False))
    assert batch[key].shape == (2, tlen, 84)
    assert np.isfinite(batch[key]).all()


def test_fmri_image_loader_path(tmp_path):
    """4-D NIfTI path (reference datasets.py:130-169): index + batch load
    through the built-in nibabel-free NIfTI-1 reader."""
    from multimodal_neuroimage_tpu.data.index import build_subject_index
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    from multimodal_neuroimage_tpu.data.synthetic import (
        generate_synthetic_cohort, synthetic_config)

    root = generate_synthetic_cohort(str(tmp_path / "c"), n_subjects=10,
                                     seed=3, include_fmri_image=True)
    cfg = synthetic_config(root, dataset_name="fMRI_image", target="sex",
                           batch_size=2, workers=1,
                           preprocess="host").validate()
    records = build_subject_index(cfg)
    assert len(records) == 10
    pipe = DataPipeline(cfg, mesh=None, records=records)
    batch, subjects = next(iter(pipe._batches("train", epoch=0,
                                              shuffle=False)))
    assert batch["fmri_sequence"].shape == (2, 12, 14, 12, 24)
    assert np.isfinite(batch["fmri_sequence"]).all()
    assert len(subjects) == 2
