"""shard_map SPMD path: per-shard fwd+bwd + gradient pmean must match the
GSPMD (global jit) step bit-for-near (same global batch, dropout off).

This is the multi-chip decomposition the Pallas fused kernels need on real
TPU pods (a pallas_call is opaque to the GSPMD partitioner); on the CPU test
mesh the plain-jnp twins run inside shard_map, so the partitioning logic is
exercised end-to-end without hardware (SURVEY §4).
"""

import jax
import numpy as np
import pytest

from multimodal_neuroimage_tpu.config import Config
from multimodal_neuroimage_tpu.models.registry import create_model
from multimodal_neuroimage_tpu.parallel.mesh import (build_mesh, replicate,
                                                     shard_batch)
from multimodal_neuroimage_tpu.train.losses import active_losses
from multimodal_neuroimage_tpu.train.state import (create_train_state,
                                                   make_eval_step,
                                                   make_train_step,
                                                   optimizer_from_config,
                                                   use_shard_map)


def _tiny_cfg():
    return Config(
        task="FuncStruct", dataset_name="multimodal",
        multimodality_type="cross_attention", target="sex",
        fine_tune_task="binary_classification", batch_size=8,
        transformer_hidden_layers=2, bert_intermediate_size=64,
        fusion_ex_depths=(1,), fusion_depths=(1,), fusion_re_depths=(1,),
        fusion_ex_heads=(2,), fusion_heads=(2,), fusion_re_heads=(2,),
        size_of_model="small", num_heads_2DBert=4, intermediate_vec=48,
        # dropout off so the gspmd and shard_map steps are comparable
        # (shard_map decorrelates per-shard rngs by design)
        transformer_dropout_rate=0.0, bert_attn_dropout=0.0,
        fusion_drop_rate=0.0, fusion_attn_drop_rate=0.0,
        fusion_drop_path_rate=0.0,
    ).validate()


def _batch(n, t=32, r=48):
    rng = np.random.default_rng(7)
    return {
        "fmri_raw_sequence": rng.normal(size=(n, t, r)).astype(np.float32),
        "fmri_lowfreq_sequence": rng.normal(size=(n, t, r)).astype(np.float32),
        "fmri_ultralowfreq_sequence": rng.normal(size=(n, t, r)).astype(np.float32),
        "struct": rng.normal(size=(n, r, r)).astype(np.float32),
        "target": rng.integers(0, 2, n).astype(np.float32),
    }


def _setup(cfg, mesh, batch, sgd=False):
    model = create_model(cfg)
    if sgd:
        # plain SGD makes params_after - params_before == -lr * grads: the
        # step comparison is then a direct, well-conditioned gradient
        # comparison (Adam normalizes by sqrt(v), amplifying eps-scale fp
        # differences wherever the true gradient is ~0)
        import optax
        tx = optax.sgd(0.1)
    else:
        tx, _ = optimizer_from_config(cfg, steps_per_epoch=10)
    state = create_train_state(model, batch, tx, cfg.seed)
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    specs = active_losses(cfg.task, cfg.fine_tune_task)
    return model, state, specs


def test_use_shard_map_policy():
    mesh = build_mesh()
    # CPU mesh -> auto stays on gspmd; explicit pins honored
    assert not use_shard_map("auto", mesh)
    assert use_shard_map("shard_map", mesh)
    assert not use_shard_map("gspmd", mesh)
    assert not use_shard_map("shard_map", None)
    with pytest.raises(ValueError):
        use_shard_map("bogus", mesh)


@pytest.mark.slow
def test_shard_map_step_matches_gspmd():
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    cfg = _tiny_cfg()
    mesh = build_mesh()
    batch = _batch(jax.device_count())
    model, state0, specs = _setup(cfg, mesh, batch, sgd=True)
    dev_batch = shard_batch(batch, mesh)

    results = {}
    for mode in ("gspmd", "shard_map"):
        step = make_train_step(model, specs, compute_dtype="float32",
                               mesh=mesh, spmd=mode, donate=False)
        state, losses, preds = step(state0, dev_batch)
        results[mode] = (
            float(losses["total"]),
            np.asarray(preds["binary_classification"]),
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.params)),
        )

    lg, pg, wg = results["gspmd"]
    ls, ps, ws = results["shard_map"]
    assert np.isfinite(lg) and np.isfinite(ls)
    np.testing.assert_allclose(lg, ls, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(pg, ps, rtol=1e-4, atol=1e-5)
    flat_g = jax.tree_util.tree_leaves(wg)
    flat_s = jax.tree_util.tree_leaves(ws)
    for a, b in zip(flat_g, flat_s):
        # atol covers reduction-order fp noise between the two compiled
        # programs (local-mean+pmean vs one global mean)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-5)


@pytest.mark.slow
@pytest.mark.parametrize("layout", ["bp", "bpr"])
def test_shard_map_step_fused_bp(layout, monkeypatch):
    """The multi-chip shard_map decomposition composed with the FAST plans
    (FUSION_LAYOUT=bp/bpr + BERT_ATTN=packed, fused kernels in interpret
    mode on CPU) matches the gspmd/std step — the exact combination a real
    TPU pod runs when autoplan picks the fast plans. Guards the
    check_vma=False requirement: jax's default vma validation rejects any
    pallas_call inside shard_map."""
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops import bert_layer as bl
    from multimodal_neuroimage_tpu.ops.attention import set_fused_attention

    cfg = _tiny_cfg()
    mesh = build_mesh()
    batch = _batch(jax.device_count())
    model, state0, specs = _setup(cfg, mesh, batch, sgd=True)
    dev_batch = shard_batch(batch, mesh)

    monkeypatch.setattr(sf, "_LAYOUT", "std")
    step = make_train_step(model, specs, compute_dtype="float32",
                           mesh=mesh, spmd="gspmd", donate=False)
    _, losses_ref, _ = step(state0, dev_batch)

    monkeypatch.setattr(sf, "_LAYOUT", layout)
    monkeypatch.setattr(bl, "_ATTN_MODE", "packed")
    set_fused_attention(True)
    try:
        step_bp = make_train_step(model, specs, compute_dtype="float32",
                                  mesh=mesh, spmd="shard_map", donate=False)
        state, losses, _ = step_bp(state0, dev_batch)
    finally:
        set_fused_attention(None)
    np.testing.assert_allclose(float(losses["total"]),
                               float(losses_ref["total"]),
                               rtol=1e-5, atol=1e-6)
    for leaf in jax.tree_util.tree_leaves(jax.device_get(state.params)):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_shard_map_fused_bp_bf16_smoke(monkeypatch):
    """bfloat16 compute (the TPU flagship policy) through shard_map + the
    fast plans: runs and produces a loss close to the std/gspmd bf16 step.
    The autoplan canaries trace f32, so without this the bf16 trace of the
    fast plans would first run on real hardware."""
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops import bert_layer as bl
    from multimodal_neuroimage_tpu.ops.attention import set_fused_attention

    cfg = _tiny_cfg()
    mesh = build_mesh()
    batch = _batch(jax.device_count())
    model, state0, specs = _setup(cfg, mesh, batch, sgd=True)
    dev_batch = shard_batch(batch, mesh)

    monkeypatch.setattr(sf, "_LAYOUT", "std")
    step = make_train_step(model, specs, compute_dtype="bfloat16",
                           mesh=mesh, spmd="gspmd", donate=False)
    _, losses_ref, _ = step(state0, dev_batch)

    monkeypatch.setattr(sf, "_LAYOUT", "bp")
    monkeypatch.setattr(bl, "_ATTN_MODE", "packed")
    set_fused_attention(True)
    try:
        step_bp = make_train_step(model, specs, compute_dtype="bfloat16",
                                  mesh=mesh, spmd="shard_map", donate=False)
        state, losses, _ = step_bp(state0, dev_batch)
    finally:
        set_fused_attention(None)
    ref, got = float(losses_ref["total"]), float(losses["total"])
    assert np.isfinite(ref) and np.isfinite(got)
    # bf16 kernels legitimately reorder reductions; just require agreement
    # at bf16 grain
    np.testing.assert_allclose(got, ref, rtol=2e-2)
    for leaf in jax.tree_util.tree_leaves(jax.device_get(state.params)):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_shard_map_eval_matches_gspmd():
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    cfg = _tiny_cfg()
    mesh = build_mesh()
    batch = _batch(jax.device_count())
    model, state, specs = _setup(cfg, mesh, batch)
    dev_batch = shard_batch(batch, mesh)

    ev_g = make_eval_step(model, specs, compute_dtype="float32",
                          mesh=mesh, spmd="gspmd")
    ev_s = make_eval_step(model, specs, compute_dtype="float32",
                          mesh=mesh, spmd="shard_map")
    lg, pg = ev_g(state.params, dev_batch)
    ls, ps = ev_s(state.params, dev_batch)
    np.testing.assert_allclose(float(lg["total"]), float(ls["total"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pg["binary_classification"]),
                               np.asarray(ps["binary_classification"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_shard_map_with_norms_and_donate():
    """The trainer's real configuration: donated state + norm cond."""
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    cfg = _tiny_cfg()
    mesh = build_mesh()
    batch = _batch(jax.device_count())
    model, state, specs = _setup(cfg, mesh, batch)
    dev_batch = shard_batch(batch, mesh)
    step = make_train_step(model, specs, compute_dtype="float32", mesh=mesh,
                           spmd="shard_map", donate=True, with_norms=True,
                           norms_every=1)
    state, losses, preds, norms = step(state, dev_batch)
    assert np.isfinite(float(losses["total"]))
    assert float(norms["grad/global"]) > 0.0
    # second step: donation + pinned shardings must not recompile into error
    state, losses, _, _ = step(state, dev_batch)
    assert np.isfinite(float(losses["total"]))
