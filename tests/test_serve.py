"""Serving path: checkpoint -> Predictor -> per-subject predictions.csv.

The reference's only inference flow is the labeled phase-4 test split
(reference main.py:569-590); serve/predictor.py adds first-class scoring of
arbitrary (possibly unlabeled) cohorts. These tests train a tiny model once,
then exercise the Predictor API, the --predict_only CLI branch, and the
unlabeled-cohort index path (build_subject_index(require_target=False)).
"""

import csv
import dataclasses
import os

import numpy as np
import pandas as pd
import pytest

from multimodal_neuroimage_tpu.data.synthetic import (generate_synthetic_cohort,
                                                      synthetic_config)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One short training run shared by every test in this module."""
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    root = str(tmp_path_factory.mktemp("serve_cohort"))
    generate_synthetic_cohort(root, n_subjects=24, seed=11)
    exp = str(tmp_path_factory.mktemp("serve_exp"))
    cfg = synthetic_config(
        root, dataset_name="sMRI", target="sex", step=3, task="VIT",
        size_of_model="small", batch_size=4, nEpochs=1, workers=2,
        lr_init=1e-3, lr_policy="step", lr_step=50,
        experiment_folder=exp, experiment_title="serve",
        compute_dtype="float32",
    ).validate()
    Trainer(cfg).training()
    return root, cfg


def test_predictor_scores_full_cohort(trained, tmp_path):
    from multimodal_neuroimage_tpu.serve.predictor import Predictor
    root, cfg = trained
    pred = Predictor(cfg)
    dest = str(tmp_path / "predictions.csv")
    out = pred.predict(write_csv=dest)
    # every cohort subject scored exactly once (24 subjects, bs=4 -> no tail;
    # window ensembling collapses repeats)
    assert len(out) == 24
    for subject, row in out.items():
        assert 0.0 <= row["score"] <= 1.0  # sigmoid probability
        assert row["label"] in (0.0, 1.0)
        assert row["label"] == float(row["score"] > pred.threshold)
    with open(dest) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 24
    assert set(rows[0]) == {"subject", "score", "label"}


def test_predictor_pads_partial_batch(trained):
    """A cohort not divisible by the batch size still scores every subject
    (tail pad-and-mask, loader.py:132-146)."""
    from multimodal_neuroimage_tpu.serve.predictor import Predictor
    root, cfg = trained
    pred = Predictor(cfg, records=None)
    recs = pred.records[:7]  # 7 subjects, bs=4 -> one full + one padded batch
    pred.records = recs
    out = pred.predict()
    assert len(out) == 7
    assert set(out) == {r.subject for r in recs}


def test_unlabeled_cohort_index(trained):
    """require_target=False keeps NA-target subjects with a dummy target."""
    from multimodal_neuroimage_tpu.data.index import build_subject_index
    root, cfg = trained
    meta_csv = os.path.join(root, "data", "metadata",
                            "ABCD_phenotype_total.csv")
    meta = pd.read_csv(meta_csv)
    orig_col = meta[cfg.target].copy()      # exact snapshot for restore
    labeled = build_subject_index(cfg)
    # blank half the targets
    meta.loc[: len(meta) // 2, cfg.target] = np.nan
    meta.to_csv(meta_csv, index=False)
    try:
        strict = build_subject_index(cfg)
        lax = build_subject_index(cfg, require_target=False)
        assert len(strict) < len(labeled)
        assert len(lax) == len(labeled)
        # a target column absent from the metadata entirely
        cfg2 = dataclasses.replace(cfg, target="not_a_column")
        with pytest.raises(KeyError):
            build_subject_index(cfg2)
        lax2 = build_subject_index(cfg2, require_target=False)
        assert len(lax2) == len(labeled)
        assert all(r.target == 0.0 for r in lax2)
    finally:
        # restore the EXACT original column (row order is preserved by the
        # read/write round trip) so later tests in the module-scoped
        # fixture see the unmodified cohort
        meta2 = pd.read_csv(meta_csv)
        meta2[cfg.target] = orig_col.values
        meta2.to_csv(meta_csv, index=False)


def test_export_roundtrip(trained, tmp_path):
    """jax.export artifact: same scores as the live Predictor, no model
    code / checkpoint / config needed at load time."""
    import numpy as np
    from multimodal_neuroimage_tpu.serve.export import (export_model,
                                                        load_exported)
    from multimodal_neuroimage_tpu.serve.predictor import Predictor
    root, cfg = trained
    pred = Predictor(cfg)
    dest = str(tmp_path / "model.stablehlo")
    export_model(pred, dest)
    assert os.path.exists(dest) and os.path.exists(dest + ".json")

    exp = load_exported(dest)
    assert exp.threshold == pred.threshold
    # one real batch through both paths
    pred.pipe.splits["x"] = list(pred.records)
    batch, names = next(iter(pred.pipe.epoch("x", shuffle=False)))
    live = np.asarray(pred._step(pred.params, batch)[pred.head]).reshape(-1)
    aot = exp(batch)
    np.testing.assert_allclose(aot, live, rtol=1e-5, atol=1e-5)
    post = exp.predict(batch)
    assert set(post) == {"score", "label"}
    assert np.all((post["score"] > 0) & (post["score"] < 1))
    # missing input key is a clear error
    short = {k: v for k, v in batch.items() if k != sorted(batch)[0]}
    with pytest.raises(KeyError):
        exp(short)

    # bf16 policy survives export: artifact params are baked pre-cast, so
    # the exported forward matches a live bf16 Predictor (not the f32 one)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    pred16 = Predictor(cfg16)
    dest16 = str(tmp_path / "model16.stablehlo")
    export_model(pred16, dest16)
    exp16 = load_exported(dest16)
    live16 = np.asarray(
        pred16._step(pred16.params, batch)[pred16.head]).reshape(-1)
    np.testing.assert_allclose(exp16(batch), live16, rtol=2e-2, atol=2e-2)
    # and the bf16 policy genuinely reached the artifact (guards the
    # numpy-params cast no-op bug): smaller blob (bf16 constants) and
    # numerics that differ from the f32 artifact's
    blob16 = os.path.getsize(dest16)
    blob32 = os.path.getsize(dest)
    assert blob16 < blob32, (blob16, blob32)
    assert float(np.max(np.abs(exp16(batch) - aot))) > 0.0


def test_predict_only_cli_branch(trained):
    """run_phase(cfg with predict_only) routes into run_predict and writes
    predictions.csv into the experiment folder."""
    from multimodal_neuroimage_tpu.cli.main import run_phase
    root, cfg = trained
    out = run_phase(dataclasses.replace(cfg, predict_only=True))
    assert len(out) == 24
    assert os.path.exists(os.path.join(cfg.experiment_folder,
                                       "predictions.csv"))


def test_predict_only_resolves_past_experiment(trained):
    """Without --experiment_folder the CLI mints a fresh empty folder; the
    predict branch must then resolve the newest same-task BEST checkpoint
    from past experiments instead of failing (README-advertised flow)."""
    import shutil
    from multimodal_neuroimage_tpu.cli.main import args_logger, run_phase
    root, cfg = trained
    # register the trained run as a past experiment under base_path,
    # with the arguments.pkl a CLI run would have archived
    past = os.path.join(root, "experiments", "serve_sex_2026")
    if not os.path.exists(past):
        shutil.copytree(cfg.experiment_folder, past)
        args_logger(dataclasses.replace(cfg, experiment_folder=past))
    fresh = dataclasses.replace(cfg, predict_only=True,
                                experiment_folder="", experiment_title="")
    out = run_phase(fresh)
    assert len(out) == 24
    # and a clear error when nothing can be found
    empty_base = os.path.join(root, "empty_base")
    os.makedirs(os.path.join(empty_base, "experiments"), exist_ok=True)
    with pytest.raises(FileNotFoundError):
        run_phase(dataclasses.replace(
            fresh, base_path=empty_base,
            metadata_csv=os.path.join(root, "data", "metadata",
                                      "ABCD_phenotype_total.csv"),
            subject_list_path=os.path.join(root,
                                           "multimodal_sub_list.txt")))
