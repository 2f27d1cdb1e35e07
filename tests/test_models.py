"""Shape/contract smoke tests for every live model family (SURVEY §2.3).

Tiny hyperparameters (2 BERT layers, single fusion groups) keep CPU compile
fast; the full-size configs share the same code paths.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_neuroimage_tpu.config import Config
from multimodal_neuroimage_tpu.models.registry import create_model

B, T, R = 2, 64, 84

TINY = dict(
    transformer_hidden_layers=2, bert_intermediate_size=128, nlevels=2,
    sequence_length=T,
    fusion_ex_depths=(1,), fusion_depths=(1,), fusion_re_depths=(1,),
    fusion_ex_heads=(2,), fusion_heads=(2,), fusion_re_heads=(2,),
    size_of_model="small", num_heads_2DBert=4, num_heads_mult=4,
)


def _batch(keys):
    rng = np.random.default_rng(0)
    full = {
        "fmri_sequence": rng.normal(size=(B, T, R)).astype(np.float32),
        "fmri_raw_sequence": rng.normal(size=(B, T, R)).astype(np.float32),
        "fmri_lowfreq_sequence": rng.normal(size=(B, T, R)).astype(np.float32),
        "fmri_ultralowfreq_sequence": rng.normal(size=(B, T, R)).astype(np.float32),
        "smri": rng.normal(size=(B, 84, 84)).astype(np.float32),
        "dti": rng.normal(size=(B, 84, 84)).astype(np.float32),
        "struct": rng.normal(size=(B, 84, 84)).astype(np.float32),
        "prs": rng.normal(size=(B, 3)).astype(np.float32),
        "target": rng.integers(0, 2, B).astype(np.float32),
    }
    return {k: full[k] for k in keys + ["target"]}


def _run(cfg: Config, batch):
    model = create_model(cfg)
    out, _ = model.init_with_output(jax.random.PRNGKey(0), batch)
    assert out["binary_classification"].shape == (B, 1)
    assert np.all(np.isfinite(np.asarray(out["binary_classification"])))
    return out


def cfg_with(**kw) -> Config:
    merged = dict(TINY)
    merged.update(kw)
    return Config(**merged).validate()


def test_transformer_net_step1():
    out = _run(cfg_with(task="2DBERT"), _batch(["fmri_sequence"]))
    assert out["reconstructed_fmri_sequence"].shape == (B, T, R)
    assert out["embedding_per_ROIs"].shape == (B, R)


def test_two_channels_step2():
    cfg = cfg_with(task="lowfreqBERT", fmri_multimodality_type="two_channels",
                   fmri_type="divided_frequency", use_merge_loss=True)
    out = _run(cfg, _batch(["fmri_sequence", "fmri_lowfreq_sequence",
                            "fmri_ultralowfreq_sequence"]))
    assert out["processed_raw"].shape == (B, R)


@pytest.mark.parametrize("mixing,concat", [("U2L_and_L2U", "concat"),
                                           ("L2U", "hadamard")])
def test_cross_attention_step2(mixing, concat):
    cfg = cfg_with(task="lowfreqBERT",
                   fmri_multimodality_type="cross_attention",
                   fmri_type="divided_frequency", mixing=mixing,
                   concat_method=concat, feature_map_gen="no")
    out = _run(cfg, _batch(["fmri_lowfreq_sequence",
                            "fmri_ultralowfreq_sequence"]))
    assert out["embedding_per_ROIs"].shape[0] == B


def test_cross_attention_different_feature_map():
    cfg = cfg_with(task="lowfreqBERT",
                   fmri_multimodality_type="cross_attention",
                   fmri_type="divided_frequency",
                   feature_map_size="different",
                   feature_map_gen="convolution_ul+l")
    _run(cfg, _batch(["fmri_lowfreq_sequence", "fmri_ultralowfreq_sequence"]))


@pytest.mark.slow
def test_swin_vae_unet_step3():
    base = cfg_with(task="VIT", dataset_name="sMRI")
    out = _run(dataclasses.replace(base, use_vae=True), _batch(["smri"]))
    assert out["vae_recon"].shape == (B, 84, 84)
    out = _run(dataclasses.replace(base, use_unet=True), _batch(["smri"]))
    assert out["struct_output"].shape == (B, 84, 84)


@pytest.mark.slow
def test_swinfusion_step6():
    cfg = cfg_with(task="SwinFusion", dataset_name="struct")
    out = _run(cfg, _batch(["smri", "dti"]))
    assert out["fused_image"].shape == (B, 84, 84)


def test_funcstruct_cross_step5():
    cfg = cfg_with(task="FuncStruct", dataset_name="multimodal",
                   multimodality_type="cross_attention", use_FC=True,
                   use_merge_loss=True)
    out = _run(cfg, _batch(["fmri_raw_sequence", "fmri_lowfreq_sequence",
                            "fmri_ultralowfreq_sequence", "struct"]))
    assert out["embedding_per_ROIs"].shape == (B, R)
    assert out["processed_raw"].shape == (B, R)


@pytest.mark.parametrize("mm", ["add", "transfer"])
def test_funcstruct_add_transfer(mm):
    cfg = cfg_with(task="FuncStruct", dataset_name="multimodal",
                   multimodality_type=mm)
    _run(cfg, _batch(["fmri_raw_sequence", "fmri_lowfreq_sequence",
                      "fmri_ultralowfreq_sequence", "struct"]))


def test_funcstruct_unet_cross_prs():
    cfg = cfg_with(task="FuncStruct", dataset_name="multimodal_prs",
                   multimodality_type="cross_attention", use_unet=True,
                   use_prs=True, use_unet_struct=True, use_unet_function=True,
                   use_unet_loss=True)
    out = _run(cfg, _batch(["fmri_raw_sequence", "fmri_lowfreq_sequence",
                            "fmri_ultralowfreq_sequence", "struct", "prs"]))
    assert out["struct_output"].shape == (B, 84, 84)
    assert out["fMRI_output"].shape == (B, 84, 84)


def test_fc_matrix_matches_numpy():
    """On-device corrcoef == the reference's CPU compute_fc
    (model.py:1941-1946)."""
    from multimodal_neuroimage_tpu.models.func_struct import batched_fc_matrix
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 50, 8)).astype(np.float32)
    got = np.asarray(batched_fc_matrix(jnp.asarray(x)))
    for i in range(2):
        ref = np.corrcoef(x[i].T)
        ref = ref * (ref > 0)
        ref = ref - np.diag(np.diagonal(ref))
        np.testing.assert_allclose(got[i], ref, atol=1e-5)
