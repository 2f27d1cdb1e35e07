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
        pd.read_csv(meta_csv)  # leave file readable
        # restore original labels for other tests in the module
        meta2 = pd.read_csv(meta_csv)
        meta2[cfg.target] = [r.target for r in labeled] + [np.nan] * (
            len(meta2) - len(labeled))
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


def test_predict_only_cli_branch(trained):
    """run_phase(cfg with predict_only) routes into run_predict and writes
    predictions.csv into the experiment folder."""
    from multimodal_neuroimage_tpu.cli.main import run_phase
    root, cfg = trained
    out = run_phase(dataclasses.replace(cfg, predict_only=True))
    assert len(out) == 24
    assert os.path.exists(os.path.join(cfg.experiment_folder,
                                       "predictions.csv"))
