"""Trainer end-to-end over the remaining data/model paths: fMRI step-1 with
on-device FIR preprocessing, multimodal step-5 (FuncStructAdd), and the HCP
cohort loader."""

import dataclasses

import numpy as np
import pytest

from multimodal_neuroimage_tpu.data.synthetic import (generate_synthetic_cohort,
                                                      generate_synthetic_hcp,
                                                      synthetic_config)

TINY = dict(
    transformer_hidden_layers=2, bert_intermediate_size=128,
    num_heads_2DBert=4, size_of_model="small", batch_size=4, nEpochs=1,
    workers=2, compute_dtype="float32", nan_audit=True,
    # these tests assert plumbing (metric keys exist), not convergence —
    # run the --profiling smoke cap (1 epoch / 10 batches, trainer.py:434)
    profiling=True,
)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tcohort"))
    generate_synthetic_cohort(root, n_subjects=32, seed=13)
    generate_synthetic_hcp(root, n_subjects=16, seed=13)
    return root


@pytest.mark.slow
def test_fmri_step1_device_preprocess(cohort, tmp_path):
    """Step-1 2DBERT over fMRI timeseries with the fused on-device FIR path
    (cfg.preprocess='device')."""
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = synthetic_config(
        cohort, dataset_name="fMRI_timeseries", fmri_type="timeseries",
        target="sex", step=1, task="2DBERT", preprocess="device",
        experiment_folder=str(tmp_path / "exp1"), **TINY).validate()
    metrics = Trainer(cfg).training()
    assert "val_AUROC" in metrics or "val_Balanced_Accuracy" in metrics


@pytest.mark.slow
def test_multimodal_step5_add(cohort, tmp_path):
    """Step-5 FuncStructAdd over the multimodal dataset (host FIR path)."""
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = synthetic_config(
        cohort, dataset_name="multimodal", fmri_type="divided_frequency",
        target="sex", step=5, task="FuncStruct", multimodality_type="add",
        preprocess="host",
        experiment_folder=str(tmp_path / "exp5"), **TINY).validate()
    metrics = Trainer(cfg).training()
    assert "train_Balanced_Accuracy" in metrics


def test_hcp_index_and_batch(cohort):
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    cfg = synthetic_config(cohort, dataset_name="hcp", target="sex",
                           intermediate_vec=22, batch_size=4,
                           workers=2).validate()
    pipe = DataPipeline(cfg)
    assert len(pipe.records) == 16
    batch, names = next(pipe.epoch("train", 0, to_device=False))
    assert batch["fmri_sequence"].shape == (4, 1200, 22)
    assert set(np.unique(batch["target"])) <= {0.0, 1.0}


def test_hcp_age_regression_index(cohort):
    from multimodal_neuroimage_tpu.data.index import build_subject_index
    cfg = synthetic_config(cohort, dataset_name="hcp", target="age",
                           fine_tune_task="regression",
                           intermediate_vec=22).validate()
    recs = build_subject_index(cfg)
    targets = np.asarray([r.target for r in recs])
    # z-scored ages: roughly centered
    assert abs(targets.mean()) < 0.5 and 0.5 < targets.std() < 2.0


@pytest.mark.slow
def test_hcp_step1_training(cohort, tmp_path):
    """Step-1 2DBERT over the HCP cohort (1200 TRs, 22 ROIs): validate()
    defaults intermediate_vec/sequence_length/heads for hcp (the reference
    relied on the user passing compatible flags — model.py:53-67)."""
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = synthetic_config(
        cohort, dataset_name="hcp", target="sex", step=1, task="2DBERT",
        preprocess="host",
        experiment_folder=str(tmp_path / "exphcp"), **TINY).validate()
    assert cfg.intermediate_vec == 22 and cfg.sequence_length == 1200
    assert cfg.num_heads_2DBert == 2
    metrics = Trainer(cfg).training()
    assert "train_AUROC" in metrics
