"""Round-4 fixes: VGG16 weights export path (VERDICT r3 missing #3 /
next-step #8) and committed per-device plan files (next-step #1e)."""

import json
import os

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# VGG16 export: torch state_dict -> npz -> PerceptualLoss
# ---------------------------------------------------------------------------


def _synthetic_vgg16_state_dict():
    """Random weights under torchvision's VGG16 key naming (features.N.*),
    standing in for the real pretrained checkpoint (reference losses.py:92;
    torchvision absent from this image, so the real weights are exported
    wherever it exists — scripts/export_vgg16_npz.py docstring)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    shapes = {0: (64, 3, 3, 3), 2: (64, 64, 3, 3),
              5: (128, 64, 3, 3), 7: (128, 128, 3, 3)}
    sd = {}
    for idx, shape in shapes.items():
        sd[f"features.{idx}.weight"] = torch.as_tensor(
            rng.normal(size=shape).astype(np.float32) * 0.1)
        sd[f"features.{idx}.bias"] = torch.as_tensor(
            rng.normal(size=shape[0]).astype(np.float32) * 0.1)
    return sd


def test_export_vgg16_activation_parity(tmp_path):
    """state_dict -> npz mapping is activation-verified against torch's own
    conv stack (the export script's built-in check, run here on synthetic
    weights so CI covers it without torchvision)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from export_vgg16_npz import (state_dict_to_npz_arrays,
                                  verify_against_torch)
    sd = _synthetic_vgg16_state_dict()
    arrays = state_dict_to_npz_arrays(sd)
    assert arrays["conv1_1/kernel"].shape == (3, 3, 3, 64)   # HWIO
    assert arrays["conv2_2/kernel"].shape == (3, 3, 128, 128)
    verify_against_torch(sd, arrays)                         # raises on drift


def test_perceptual_loss_with_exported_npz(tmp_path):
    """The exported npz drives the FULL perceptual loss (not just the
    feature module): loaded weights change the loss vs random-init, and the
    loss of identical inputs is exactly zero."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import jax.numpy as jnp
    from export_vgg16_npz import state_dict_to_npz_arrays

    from multimodal_neuroimage_tpu.nn.perceptual import PerceptualLoss

    arrays = state_dict_to_npz_arrays(_synthetic_vgg16_state_dict())
    path = tmp_path / "vgg16_stage12.npz"
    np.savez(path, **arrays)

    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))

    loss_loaded = PerceptualLoss(task="transformer_reconstruction",
                                 weights_npz=str(path))
    loss_random = PerceptualLoss(task="transformer_reconstruction", seed=3)
    v_loaded = float(loss_loaded(pred, target))
    v_random = float(loss_random(pred, target))
    assert np.isfinite(v_loaded) and v_loaded > 0
    assert abs(v_loaded - v_random) > 1e-9          # weights actually used
    assert float(loss_loaded(pred, pred)) == pytest.approx(0.0, abs=1e-10)

    # the npz round-trips through the documented loader contract
    k = np.load(path)
    assert {f"{n}/{leaf}" for n in
            ("conv1_1", "conv1_2", "conv2_1", "conv2_2")
            for leaf in ("kernel", "bias")} <= set(k.files)


# ---------------------------------------------------------------------------
# Committed per-device plan files (plans/<device_kind>.json)
# ---------------------------------------------------------------------------


def test_plan_cache_roundtrip_per_device_file(tmp_path, monkeypatch):
    """save_plan_cache writes plans/<device_kind>.json (tracked) and
    _load_plan_cache prefers it; a mismatched device_kind is ignored."""
    from multimodal_neuroimage_tpu.ops import autoplan

    monkeypatch.setattr(autoplan, "_REPO_ROOT", str(tmp_path))
    monkeypatch.setattr(autoplan, "_LEGACY_PLAN_CACHE",
                        str(tmp_path / ".plan_cache.json"))
    monkeypatch.setattr(autoplan, "_device_kind", lambda: "TPU v5 lite")

    autoplan.save_plan_cache("bp", "loop", {"x": 1}, bert_grid="batched",
                             bert_bc=4)
    path = tmp_path / "plans" / "tpu_v5_lite.json"
    assert path.exists()
    cache = autoplan._load_plan_cache()
    assert cache["fusion_layout"] == "bp" and cache["bert_attn"] == "loop"
    assert cache["bert_grid"] == "batched" and cache["bert_bc"] == 4

    # foreign hardware class: the file must not apply
    monkeypatch.setattr(autoplan, "_device_kind", lambda: "TPU v4")
    assert autoplan._load_plan_cache() is None

    # legacy machine-local cache still honored when it matches
    with open(tmp_path / ".plan_cache.json", "w") as f:
        json.dump({"device_kind": "TPU v4", "fusion_layout": "std",
                   "bert_attn": "packed"}, f)
    assert autoplan._load_plan_cache()["fusion_layout"] == "std"


# ---------------------------------------------------------------------------
# Pack placement modes (round-4 ablation work): tile and dot produce
# identical packed K/V layouts
# ---------------------------------------------------------------------------


def test_pack_kv_tile_matches_dot(monkeypatch):
    import jax.numpy as jnp
    from multimodal_neuroimage_tpu.ops import fusion_block as fb

    rng = np.random.default_rng(7)
    t3 = jnp.asarray(rng.normal(size=(5, 16, 12)).astype(np.float32))
    monkeypatch.setattr(fb, "_PACK_MODE", "dot")
    ref = np.asarray(fb._pack_kv(t3, 6))
    monkeypatch.setattr(fb, "_PACK_MODE", "tile")
    tile = np.asarray(fb._pack_kv(t3, 6))
    np.testing.assert_array_equal(ref, tile)
    assert ref.shape == (5, 12, 6 * 16)
