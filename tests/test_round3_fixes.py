"""Round-3 fixes: exact pad-masked eval losses (every loss excludes pad rows
bitwise-exactly, reference dataloaders.py:139 drop-last-for-train-only
semantics), loud zero-train-step failure, and the loader's constant-shape
``valid`` vector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_neuroimage_tpu.data.synthetic import (generate_synthetic_cohort,
                                                      synthetic_config)


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cohort_r3"))
    return generate_synthetic_cohort(root, n_subjects=48, seed=11)


# ---------------------------------------------------------------------------
# Every loss, masked on a padded batch == unmasked on the valid sub-batch
# ---------------------------------------------------------------------------

def _pad_rows(x: np.ndarray, n_pad: int, rng) -> np.ndarray:
    """Append n_pad wrap-around duplicate rows (what the loader's pad-and-mask
    tail does, data/loader.py) with a little noise so a wrong implementation
    cannot pass by accident."""
    dup = x[:n_pad] + rng.normal(0, 0.5, x[:n_pad].shape).astype(x.dtype)
    return np.concatenate([x, dup], axis=0)


def test_losses_masked_equals_unpadded(rng):
    from multimodal_neuroimage_tpu.train import losses as L
    nv, npad = 5, 3
    valid = jnp.asarray([1.0] * nv + [0.0] * npad)

    def check(fn, *arrays, **kw):
        arrs = [jnp.asarray(a) for a in arrays]
        padded = [jnp.asarray(_pad_rows(np.asarray(a), npad, rng))
                  for a in arrays]
        want = fn(*arrs, **kw)
        got = fn(*padded, valid=valid, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    logits = rng.normal(size=(nv,)).astype(np.float32)
    target = rng.integers(0, 2, nv).astype(np.float32)
    check(L.bce_with_logits, logits, target)
    check(L.l1_loss, rng.normal(size=(nv, 4)).astype(np.float32),
          rng.normal(size=(nv, 4)).astype(np.float32))
    check(L.mse_loss, rng.normal(size=(nv, 4)).astype(np.float32),
          rng.normal(size=(nv, 4)).astype(np.float32))
    check(L.merge_loss, rng.normal(size=(nv, 6)).astype(np.float32),
          rng.normal(size=(nv, 6)).astype(np.float32))
    check(L.contrastive_loss, rng.normal(size=(nv, 5, 6)).astype(np.float32))
    check(L.reconstruction_loss,
          rng.normal(size=(nv, 7, 6)).astype(np.float32),
          rng.normal(size=(nv, 7, 6)).astype(np.float32))
    check(L.unet_loss,
          rng.normal(size=(nv, 8, 8)).astype(np.float32),
          rng.normal(size=(nv, 8, 8)).astype(np.float32),
          rng.normal(size=(nv, 8, 8)).astype(np.float32),
          rng.normal(size=(nv, 8, 8)).astype(np.float32))
    # mask_loss: mask_idx must be int and pad the same way
    enc = rng.normal(size=(nv, 9, 6)).astype(np.float32)
    rec = rng.normal(size=(nv, 9, 6)).astype(np.float32)
    midx = rng.integers(0, 9, (nv, 3))
    want = L.mask_loss(jnp.asarray(enc), jnp.asarray(midx), jnp.asarray(rec))
    got = L.mask_loss(jnp.asarray(_pad_rows(enc, npad, rng)),
                      jnp.asarray(np.concatenate([midx, midx[:npad]], 0)),
                      jnp.asarray(_pad_rows(rec, npad, rng)), valid=valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # intensity_loss on a 5-D volume batch
    vol = np.abs(rng.normal(size=(nv, 4, 4, 3, 5))).astype(np.float32)
    pred = vol + 0.1 * rng.normal(size=vol.shape).astype(np.float32)
    check(L.intensity_loss, pred, vol)


def test_perceptual_masked_equals_unpadded(rng):
    from multimodal_neuroimage_tpu.nn.perceptual import PerceptualLoss
    nv, npad = 3, 2
    ploss = PerceptualLoss(task="autoencoder_reconstruction", seed=0)
    pred = rng.normal(size=(nv, 10, 6)).astype(np.float32)
    tgt = rng.normal(size=(nv, 10, 6)).astype(np.float32)
    # memory_constraint=0.25 subsamples slices, so exact equality needs the
    # SAME slice draw: compare full-batch vs padded at keep covering pads too
    ploss.memory_constraint = 1.0  # score every slice -> draw-independent
    want = float(ploss(jnp.asarray(pred), jnp.asarray(tgt)))
    pp = jnp.asarray(_pad_rows(pred, npad, rng))
    pt = jnp.asarray(_pad_rows(tgt, npad, rng))
    valid = jnp.asarray([1.0] * nv + [0.0] * npad)
    got = float(ploss(pp, pt, valid=valid))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# End-to-end: eval loss on a padded tail equals the hand-computed loss over
# the REAL subjects only (VERDICT r2 item 5's acceptance criterion)
# ---------------------------------------------------------------------------

def test_eval_tail_loss_exact(cohort, tmp_path):
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    from multimodal_neuroimage_tpu.models.registry import create_model
    from multimodal_neuroimage_tpu.train.losses import (active_losses,
                                                        bce_with_logits)
    from multimodal_neuroimage_tpu.train.state import (create_train_state,
                                                       make_eval_step,
                                                       optimizer_from_config)
    cfg = synthetic_config(
        cohort, dataset_name="sMRI", target="sex", step=3, task="VIT",
        size_of_model="small", batch_size=8, workers=2,
        compute_dtype="float32").validate()
    pipe = DataPipeline(cfg)
    (batch, names), = list(pipe.epoch("val", 0, to_device=False))
    n_valid = sum(n is not None for n in names)
    assert 0 < n_valid < len(names)        # a genuine padded tail
    assert "valid" in batch
    np.testing.assert_array_equal(
        batch["valid"], [1.0 if n is not None else 0.0 for n in names])

    model = create_model(cfg)
    tx, _ = optimizer_from_config(cfg, steps_per_epoch=1)
    state = create_train_state(model, batch, tx, cfg.seed)
    specs = active_losses(cfg.task, cfg.fine_tune_task)
    eval_step = make_eval_step(model, specs, cfg.compute_dtype)
    losses, _ = eval_step(state.params, batch)

    # hand-compute: forward the same padded batch, then BCE over REAL rows
    outputs = model.apply({"params": state.params}, batch, deterministic=True)
    logits = np.asarray(
        outputs["binary_classification"], np.float32).reshape(-1)[:n_valid]
    tgt = np.asarray(batch["target"], np.float32)[:n_valid]
    want = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(tgt)))
    np.testing.assert_allclose(float(losses["binary_classification"]), want,
                               rtol=1e-5, atol=1e-6)
    # the padded duplicate rows must NOT influence the recorded loss: corrupt
    # them and re-evaluate
    batch2 = dict(batch)
    key = "smri"
    arr = np.asarray(batch2[key]).copy()
    arr[n_valid:] += 17.0
    batch2[key] = arr
    losses2, _ = eval_step(state.params, batch2)
    np.testing.assert_allclose(float(losses2["binary_classification"]), want,
                               rtol=1e-5, atol=1e-6)


def test_full_eval_batches_carry_all_ones_valid(cohort):
    from multimodal_neuroimage_tpu.data.loader import DataPipeline
    cfg = synthetic_config(
        cohort, dataset_name="sMRI", target="sex", step=3, task="VIT",
        batch_size=4, workers=2).validate()
    pipe = DataPipeline(cfg)
    batches = list(pipe.epoch("val", 0, to_device=False))
    assert len(batches) >= 1
    for batch, names in batches[:-1]:
        np.testing.assert_array_equal(batch["valid"],
                                      np.ones(len(names), np.float32))
    # train batches never pad -> no valid key (shapes stay the train jit's)
    for batch, _ in pipe.epoch("train", 0, to_device=False):
        assert "valid" not in batch
        break


# ---------------------------------------------------------------------------
# Zero-train-step splits raise (VERDICT r2 item 8)
# ---------------------------------------------------------------------------

def test_zero_train_steps_raises(cohort, tmp_path):
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = synthetic_config(
        cohort, dataset_name="sMRI", target="sex", step=3, task="VIT",
        size_of_model="small", batch_size=64,  # 48 subjects < 64 batch
        workers=2, experiment_folder=str(tmp_path / "exp"),
        compute_dtype="float32").validate()
    with pytest.raises(ValueError, match="zero train steps"):
        Trainer(cfg)


# ---------------------------------------------------------------------------
# Compile-failure plan demotion (Mosaic scoped-vmem refusals are PROGRAM-
# dependent: a canary-passing plan can fail inside the real train step —
# measured on v5e, see autoplan.demote_plan_after_compile_failure)
# ---------------------------------------------------------------------------

def _vmem_err():
    return RuntimeError(
        "INTERNAL: Mosaic failed ... Scoped allocation with size 101.89M "
        "and limit 16.00M exceeded scoped vmem limit")


def test_demotion_chain_order(monkeypatch):
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops import autoplan
    from multimodal_neuroimage_tpu.ops import bert_layer as bl
    monkeypatch.delenv("FUSION_LAYOUT", raising=False)
    monkeypatch.setattr(bl, "_GRID_PINNED", False)
    monkeypatch.setattr(bl, "_ATTN_PINNED", False)
    monkeypatch.setattr(bl, "_GRID_MODE", "batched")
    monkeypatch.setattr(bl, "_BC_CAP", 8)
    monkeypatch.setattr(bl, "_ATTN_MODE", "packed")
    monkeypatch.setattr(sf, "_LAYOUT", "bpr")
    seen = []
    while True:
        d = autoplan.demote_plan_after_compile_failure(_vmem_err())
        if d is None:
            break
        seen.append(d)
    assert seen == ["bert grid Bc cap -> 4", "bert grid Bc cap -> 2",
                    "bert grid batched -> subject",
                    "fusion layout bpr -> bp", "fusion layout bp -> std",
                    "bert attention packed -> loop"]
    assert bl._GRID_MODE == "subject" and sf._LAYOUT == "std"
    assert bl._ATTN_MODE == "loop"
    # non-resource errors never demote
    monkeypatch.setattr(bl, "_GRID_MODE", "batched")
    assert autoplan.demote_plan_after_compile_failure(
        ValueError("shapes do not match")) is None
    assert bl._GRID_MODE == "batched"


def test_demotion_respects_pins(monkeypatch):
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops import autoplan
    from multimodal_neuroimage_tpu.ops import bert_layer as bl
    monkeypatch.setenv("FUSION_LAYOUT", "bpr")
    monkeypatch.setattr(bl, "_GRID_PINNED", True)
    monkeypatch.setattr(bl, "_ATTN_PINNED", True)
    monkeypatch.setattr(bl, "_GRID_MODE", "batched")
    monkeypatch.setattr(bl, "_ATTN_MODE", "packed")
    monkeypatch.setattr(sf, "_LAYOUT", "bpr")
    assert autoplan.demote_plan_after_compile_failure(_vmem_err()) is None
    assert bl._GRID_MODE == "batched" and sf._LAYOUT == "bpr"


def test_trainer_call_step_retries_after_demotion(monkeypatch):
    """_call_step rebuilds the jitted steps and retries after a demotion."""
    import types
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops import bert_layer as bl
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    monkeypatch.setattr(bl, "_GRID_PINNED", False)
    monkeypatch.setattr(bl, "_GRID_MODE", "batched")
    monkeypatch.setattr(bl, "_BC_CAP", 2)
    calls = {"built": 0}
    host = types.SimpleNamespace()

    def failing_step(*a):
        raise RuntimeError("Ran out of memory in memory space vmem")

    def good_step(*a):
        return "state", {"loss": 1.0}, None

    def build():
        calls["built"] += 1
        host.train_step = good_step
        host.eval_step = good_step
    host.train_step = failing_step
    host.eval_step = failing_step
    host._build_steps = build
    out = Trainer._call_step(host, "train", None, None)
    assert out[0] == "state"
    assert calls["built"] == 1
    assert bl._GRID_MODE == "subject"


def test_fusion_stream_policy_follows_compute_dtype():
    """An explicit float32 run must keep f32 fusion streams (STREAM16 only
    re-casts under the bf16 compute policy)."""
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.train.state import (
        _set_fusion_stream_policy)
    import jax.numpy as jnp
    prev = sf._POLICY16
    try:
        _set_fusion_stream_policy(jnp.float32)
        assert sf._POLICY16 is False
        assert sf._stream16_active() is False
        _set_fusion_stream_policy(jnp.bfloat16)
        assert sf._POLICY16 is True
    finally:
        sf._POLICY16 = prev
