"""Unit tests: vectorized losses vs naive loop references, metric semantics,
checkpoint policy, NIfTI roundtrip, sinc resample."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_neuroimage_tpu.train import losses as L


def test_bce_matches_manual():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8,)).astype(np.float32)
    y = rng.integers(0, 2, 8).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    manual = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    got = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(y)))
    assert abs(got - manual) < 1e-6


def test_contrastive_loss_matches_loop():
    """Vectorized Cont_Loss == the reference's O(T^2) loop
    (losses.py:128-156)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 5)).astype(np.float32) * 50
    margin = 60000.0
    T = x.shape[1]
    loop = 0.0
    for a in range(T):
        for b in range(T):
            if a > b:
                d2 = np.sum((x[:, a] - x[:, b]) ** 2)
                if a - b == 1:
                    loop += max(0.0, margin - d2)
                else:
                    loop += d2
    loop /= T * (T - 1) * 1000
    got = float(L.contrastive_loss(jnp.asarray(x)))
    assert abs(got - loop) / abs(loop) < 1e-4


def test_merge_loss_matches_loop():
    """Vectorized Merge_Loss == the reference's O(B^2) cosine loop
    (losses.py:190-219)."""
    rng = np.random.default_rng(2)
    raw = rng.normal(size=(4, 7)).astype(np.float32)
    merged = rng.normal(size=(4, 7)).astype(np.float32)
    B = 4
    loop = 0.0
    for i in range(B):
        for j in range(B):
            a, b = merged[i], raw[j]
            cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
            loop += cos if i == j else max(0.0, 1.0 - cos)
    loop /= B * B
    got = float(L.merge_loss(jnp.asarray(raw), jnp.asarray(merged)))
    assert abs(got - loop) < 1e-5


def test_unet_loss_matches_loop():
    rng = np.random.default_rng(3)
    fi = rng.normal(size=(3, 8, 8)).astype(np.float32)
    fo = rng.normal(size=(3, 8, 8)).astype(np.float32)
    si = rng.normal(size=(3, 8, 8)).astype(np.float32)
    so = rng.normal(size=(3, 8, 8)).astype(np.float32)

    def mm(x):
        return (x - x.min()) / (x.max() - x.min())

    loop = sum(np.mean((fo[i] - mm(fi[i])) ** 2) for i in range(3))
    loop += sum(np.mean((so[i] - mm(si[i])) ** 2) for i in range(3))
    loop /= 10 * 3
    got = float(L.unet_loss(*(jnp.asarray(a) for a in (fi, fo, si, so))))
    assert abs(got - loop) < 1e-5


def test_active_losses_registry():
    """Activation rules per loss_writer.py:181-201."""
    a = L.active_losses("VIT", "binary_classification")
    assert set(a) == {"binary_classification"}
    a = L.active_losses("FuncStruct", "regression", use_merge_loss=True,
                        use_unet_loss=True)
    assert set(a) == {"merge", "unet", "regression"}
    a = L.active_losses("transformer_reconstruction", "binary_classification",
                        use_cont_loss=True)
    assert {"perceptual", "reconstruction", "contrastive"} <= set(a)


def test_roc_threshold_freezing():
    from multimodal_neuroimage_tpu.evaluation.metrics import roc_threshold_metrics
    truth = np.array([0, 0, 1, 1, 0, 1, 1, 0])
    score = np.array([.1, .4, .35, .8, .2, .7, .9, .3])
    best = roc_threshold_metrics(truth, score)
    frozen = roc_threshold_metrics(truth, score,
                                   frozen_threshold=best["threshold"])
    assert frozen["threshold"] == best["threshold"]
    assert 0 <= frozen["gmean"] <= 1


def test_checkpoint_best_policy(tmp_path):
    from multimodal_neuroimage_tpu.ckpt.checkpoint import BestCheckpointPolicy
    pol = BestCheckpointPolicy(str(tmp_path), "t")
    p1 = pol.update(val_auroc=0.6, params={"w": np.zeros(2)})
    assert p1 and "BEST_val_AUROC" in p1
    assert pol.update(val_auroc=0.5, params={"w": np.zeros(2)}) is None
    p2 = pol.update(val_auroc=0.5, val_acc=0.9, params={"w": np.zeros(2)})
    assert p2 and "BEST_val_accuracy" in p2

    # resume: a fresh policy over the same folder restores best-so-far and
    # refuses to overwrite the 0.6-AUROC file with a worse post-crash epoch
    pol2 = BestCheckpointPolicy(str(tmp_path), "t")
    pol2.resume()
    assert pol2.best_auroc == 0.6 and pol2.best_acc == 0.9
    assert pol2.update(val_auroc=0.55, params={"w": np.zeros(2)}) is None
    p3 = pol2.update(val_auroc=0.7, params={"w": np.zeros(2)})
    assert p3 and "BEST_val_AUROC" in p3

    # regression flavor
    pr = BestCheckpointPolicy(str(tmp_path), "r", "regression")
    assert pr.update(val_loss=1.0, params={"w": np.zeros(2)})
    pr2 = BestCheckpointPolicy(str(tmp_path), "r", "regression")
    pr2.resume()
    assert pr2.best_loss == 1.0
    assert pr2.update(val_loss=1.5, params={"w": np.zeros(2)}) is None


def test_nifti_roundtrip(tmp_path):
    from multimodal_neuroimage_tpu.data.nifti import read_nifti, write_nifti
    rng = np.random.default_rng(4)
    vol = rng.normal(size=(5, 7, 6, 3)).astype(np.float32)
    path = str(tmp_path / "x.nii")
    write_nifti(path, vol)
    got = read_nifti(path)
    np.testing.assert_allclose(got, vol, atol=1e-6)


def test_sinc_resample_preserves_slow_signal():
    from multimodal_neuroimage_tpu.data.filters import sinc_resample
    t = np.arange(360)
    x = np.sin(2 * np.pi * 0.005 * t)[None].repeat(2, axis=0)
    y = sinc_resample(x, 3, 1)
    assert y.shape == (2, 120)
    ref = np.sin(2 * np.pi * 0.005 * np.arange(0, 360, 3))
    # interior matches the ideal decimation (edges see the window)
    np.testing.assert_allclose(y[0, 10:-10], ref[10:-10], atol=5e-3)


def test_subject_accumulator_window_ensemble():
    from multimodal_neuroimage_tpu.evaluation.metrics import SubjectAccumulator
    acc = SubjectAccumulator("binary_classification")
    acc.append(["s1", "s2"], [2.0, -2.0], [1.0, 0.0], "val")
    acc.append(["s1"], [0.0], [1.0], "val")  # second window for s1
    subs, means, stds, truths = acc.per_subject("val")
    i = subs.index("s1")
    expected = (1 / (1 + np.exp(-2.0)) + 0.5) / 2
    assert abs(means[i] - expected) < 1e-6
    m = acc.summary(["val"])
    assert "val_AUROC" in m
    acc.reset(keep_mode="train")
    assert acc.per_subject("val")[0] == []
