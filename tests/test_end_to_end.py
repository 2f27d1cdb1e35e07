"""End-to-end slice: synthetic cohort -> data pipeline -> SwinV2 -> train ->
metrics -> checkpoint -> resume/test.

Mirrors the reference's minimum working path (SURVEY §7.2 step 4:
``--step 3 --dataset_name sMRI --VIT_name swinv2 --target sex``,
trainer.py:228-239) plus the phase-4 test flow (main.py:569-590).
"""

import os

import numpy as np
import pytest

from multimodal_neuroimage_tpu.config import config_for_phase
from multimodal_neuroimage_tpu.data.synthetic import (generate_synthetic_cohort,
                                                      synthetic_config)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cohort"))
    return generate_synthetic_cohort(root, n_subjects=48, seed=7)


def make_cfg(cohort, tmp_path, **kw):
    base = dict(
        dataset_name="sMRI", target="sex", step=3, task="VIT",
        size_of_model="small", batch_size=4, nEpochs=2, workers=2,
        lr_init=1e-3, lr_policy="step", lr_step=50,
        experiment_folder=str(tmp_path / "exp"),
        experiment_title="e2e", compute_dtype="float32",
    )
    base.update(kw)
    return synthetic_config(cohort, **base).validate()


def test_pipeline_shapes_and_split(cohort, tmp_path):
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    cfg = make_cfg(cohort, tmp_path)
    pipe = DataPipeline(cfg)
    # subject-level split: 0.7/0.15/0.15 over 48 subjects
    assert len(pipe.splits["train"]) == 33
    assert len(pipe.splits["val"]) == 7
    assert len(pipe.splits["test"]) == 8
    # split persisted in the reference text format, reload idempotent
    split_file = os.path.join(cohort, "splits", "sMRI", f"seed_{cfg.seed}.txt")
    assert os.path.exists(split_file)
    pipe2 = DataPipeline(cfg)
    assert [r.subject for r in pipe2.splits["train"]] == \
           [r.subject for r in pipe.splits["train"]]

    batch, names = next(pipe.epoch("train", 0, to_device=False))
    assert batch["smri"].shape == (4, 84, 84)
    assert batch["smri"].dtype == np.float16  # datasets.py:474 .half()
    assert batch["target"].shape == (4,)
    assert len(names) == 4


def test_train_sex_classification_smri(cohort, tmp_path):
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = make_cfg(cohort, tmp_path)
    trainer = Trainer(cfg)
    metrics = trainer.training()
    assert "val_AUROC" in metrics
    assert "train_Balanced_Accuracy" in metrics
    # planted signal should be learnable above chance on train
    assert metrics["train_AUROC"] > 0.55
    # best-AUROC checkpoint written (trainer.py:660-690 policy)
    ckpts = os.listdir(cfg.experiment_folder)
    assert any("BEST_val_AUROC" in c for c in ckpts)
    assert os.path.exists(os.path.join(cfg.experiment_folder,
                                       "full_scores.csv"))

    # phase-4 test flow reuses the frozen threshold
    test_trainer = Trainer(make_cfg(cohort, tmp_path, task="test", step=4),
                           sets=["test"])
    tm = test_trainer.testing()
    assert "test_Balanced_Accuracy" in tm


def test_last_epoch_checkpoint_and_resume(cohort, tmp_path):
    """A rolling *_last_epoch.ckpt is written every epoch (reference
    model.py:111-151) and a crash resumes at the NEXT epoch (reference
    trainer.py:144 st_epoch = epoch + 1), even if the best-metric
    checkpoint is older."""
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = make_cfg(cohort, tmp_path, nEpochs=2)
    Trainer(cfg).training()
    last = os.path.join(cfg.experiment_folder, "e2e_last_epoch.ckpt")
    assert os.path.exists(last)

    # a fresh Trainer in the same folder resumes after the last completed
    # epoch — with nEpochs=2 and epochs 0..1 done, nothing re-runs
    resumed = Trainer(cfg)
    assert resumed.epoch0 == 2
    metrics = resumed.training()
    assert metrics == {}  # no epochs left; no work repeated

    # save_last_epoch=False suppresses the rolling file
    cfg2 = make_cfg(cohort, tmp_path, nEpochs=1, save_last_epoch=False,
                    experiment_folder=str(tmp_path / "exp2"))
    Trainer(cfg2).training()
    assert not any("last_epoch" in c
                   for c in os.listdir(cfg2.experiment_folder))


def test_regression_path(cohort, tmp_path):
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = make_cfg(cohort, tmp_path, target="BMI",
                   fine_tune_task="regression", nEpochs=1)
    trainer = Trainer(cfg)
    metrics = trainer.training()
    assert "val_MAE" in metrics and "val_R2_score" in metrics
    ckpts = os.listdir(cfg.experiment_folder)
    assert any("BEST_val_loss" in c for c in ckpts)


def test_partial_restore_phase_chain(cohort, tmp_path):
    """Cross-phase transfer: restore step-3 weights into a fresh model
    (model.py:90-108 semantics)."""
    import jax
    from multimodal_neuroimage_tpu.ckpt.checkpoint import (partial_restore,
                                                           save_checkpoint,
                                                           load_raw_params)
    from multimodal_neuroimage_tpu.models.registry import create_model
    cfg = make_cfg(cohort, tmp_path)
    model = create_model(cfg)
    batch = {"smri": np.zeros((2, 84, 84), np.float32),
             "target": np.zeros((2,), np.float32)}
    p1 = model.init(jax.random.PRNGKey(0), batch)["params"]
    path = str(tmp_path / "w.ckpt")
    save_checkpoint(path, params=p1)
    p2 = model.init(jax.random.PRNGKey(1), batch)["params"]
    merged, stats = partial_restore(p2, load_raw_params(path))
    assert stats["copied"] > 0 and stats["missing"] == 0
    leaf1 = jax.tree_util.tree_leaves(p1)[0]
    leafm = jax.tree_util.tree_leaves(merged)[0]
    np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leafm))
