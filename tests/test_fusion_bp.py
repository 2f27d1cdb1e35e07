"""Parity tests for the batch-lane-packed fused SwinFusion kernels
(ops/fusion_block_bp.py) against the pure-jnp references of
ops/fusion_block.py. The BP kernels are an alternative execution plan for
the same math — deterministic values and gradients must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_neuroimage_tpu.nn.swin2d import (relative_position_index,
                                                 shift_attn_mask)
from multimodal_neuroimage_tpu.ops import fusion_block as fb
from multimodal_neuroimage_tpu.ops import fusion_block_bp as fbp

B, RES, WS, C, H = 2, 12, 6, 12, 6
N = WS * WS
NP = fb.round_up(N, 8)
NW = (RES // WS) ** 2
HID = 4 * C


def _pk(bias):
    return jnp.transpose(jnp.asarray(bias, jnp.float32),
                         (1, 0, 2)).reshape(NP, H * NP)


def _params(key, cross=False):
    n = 16 if cross else 12
    ks = jax.random.split(key, n)
    shapes = fb.param_shapes(C, HID, cross=cross)
    p = [jax.random.normal(k, s, jnp.float32) * 0.3
         for k, s in zip(ks, shapes)]
    for i in ((0, 2, 10) if cross else (0, 6)):     # LN scales positive
        p[i] = jnp.abs(p[i]) + 0.5
    return tuple(p)


def _inputs(shift=0, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, NW, NP, C)).astype(np.float32)
    x[:, :, N:, :] = 0.0
    table = jnp.asarray(
        rng.normal(size=((2 * WS - 1) ** 2, H)).astype(np.float32) * 0.1)
    rel_idx = relative_position_index(WS, WS)
    bias = fb.combined_bias(table, WS, H, NP, rel_idx)
    mask = shift_attn_mask(RES, RES, WS, shift)
    maskp = (None if mask is None
             else np.pad(mask, ((0, 0), (0, NP - N), (0, NP - N))))
    dp = jnp.asarray([[1.25, 0.8], [1.0, 1.0]], jnp.float32)
    return jnp.asarray(x), table, bias, maskp, dp


def test_bp_layout_roundtrip():
    x, *_ = _inputs(0)
    np.testing.assert_array_equal(np.asarray(fbp.from_bp(fbp.to_bp(x), B)),
                                  np.asarray(x))


@pytest.mark.parametrize("shift", [0, 3])
def test_bp_forward_parity(shift):
    x, _, bias, maskp, dp = _inputs(shift)
    params = _params(jax.random.PRNGKey(1))
    got_bp = fbp.fused_fusion_block_bp(fbp.to_bp(x), params, _pk(bias),
                                       maskp, dp, 0, (0.0, 0.0), False,
                                       interpret=True)
    got = fbp.from_bp(got_bp, B)
    want = fb.fusion_block_reference(x, params, bias, maskp, dp)
    np.testing.assert_allclose(np.asarray(got)[:, :, :N],
                               np.asarray(want)[:, :, :N],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [0, 3])
def test_bp_grad_parity(shift):
    x, _, bias, maskp, dp = _inputs(shift, seed=3)
    params = _params(jax.random.PRNGKey(2))
    cot = jnp.asarray(
        np.random.default_rng(7).normal(size=x.shape).astype(np.float32))
    cot = cot.at[:, :, N:, :].set(0.0)

    def loss_bp(x, params, bias):
        out = fbp.fused_fusion_block_bp(fbp.to_bp(x), params, _pk(bias),
                                        maskp, dp, 0, (0.0, 0.0), False,
                                        interpret=True)
        return jnp.sum(fbp.from_bp(out, B) * cot)

    def loss_ref(x, params, bias):
        out = fb.fusion_block_reference(x, params, bias, maskp, dp)
        return jnp.sum(out * cot)

    gf = jax.grad(loss_bp, argnums=(0, 1, 2))(x, params, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, params, bias)
    np.testing.assert_allclose(np.asarray(gf[0])[:, :, :N],
                               np.asarray(gr[0])[:, :, :N],
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(gf[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[2])[:, :N, :N],
                               np.asarray(gr[2])[:, :N, :N],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shift", [0, 3])
def test_bp_cross_parity(shift):
    x, _, bias, maskp, dp = _inputs(shift, seed=21)
    y = jnp.asarray(np.random.default_rng(22).normal(
        size=x.shape).astype(np.float32))
    y = y.at[:, :, N:, :].set(0.0)
    params = _params(jax.random.PRNGKey(9), cross=True)
    got_bp = fbp.fused_cross_fusion_block_bp(
        fbp.to_bp(x), fbp.to_bp(y), params, _pk(bias), maskp, dp, 0,
        (0.0, 0.0), False, interpret=True)
    got = fbp.from_bp(got_bp, B)
    want = fb.cross_fusion_block_reference(x, y, params, bias, maskp, dp)
    np.testing.assert_allclose(np.asarray(got)[:, :, :N],
                               np.asarray(want)[:, :, :N],
                               rtol=2e-5, atol=2e-5)


def test_bp_cross_grad_parity():
    x, _, bias, maskp, dp = _inputs(3, seed=31)
    y = jnp.asarray(np.random.default_rng(32).normal(
        size=x.shape).astype(np.float32))
    y = y.at[:, :, N:, :].set(0.0)
    params = _params(jax.random.PRNGKey(10), cross=True)
    cot = jnp.asarray(
        np.random.default_rng(33).normal(size=x.shape).astype(np.float32))
    cot = cot.at[:, :, N:, :].set(0.0)

    def loss_bp(x, y, params, bias):
        out = fbp.fused_cross_fusion_block_bp(
            fbp.to_bp(x), fbp.to_bp(y), params, _pk(bias), maskp, dp, 0,
            (0.0, 0.0), False, interpret=True)
        return jnp.sum(fbp.from_bp(out, B) * cot)

    def loss_ref(x, y, params, bias):
        out = fb.cross_fusion_block_reference(x, y, params, bias, maskp, dp)
        return jnp.sum(out * cot)

    gf = jax.grad(loss_bp, argnums=(0, 1, 2, 3))(x, y, params, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, y, params, bias)
    for name, a, b in (("dx", gf[0], gr[0]), ("dy", gf[1], gr[1])):
        np.testing.assert_allclose(np.asarray(a)[:, :, :N],
                                   np.asarray(b)[:, :, :N],
                                   rtol=1e-4, atol=1e-4, err_msg=name)
    for a, b in zip(gf[2], gr[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[3])[:, :N, :N],
                               np.asarray(gr[3])[:, :N, :N],
                               rtol=1e-4, atol=1e-4)


def test_bp_stochastic_grad_is_true_gradient():
    """Fixed seed -> deterministic stochastic forward; the custom VJP must
    match the directional numerical derivative (catches fwd/bwd dropout
    mask divergence across the BP grids)."""
    from jax.experimental.pallas import tpu as pltpu
    x, _, bias, maskp, dp = _inputs(3, seed=9)
    params = _params(jax.random.PRNGKey(6))
    interp = pltpu.InterpretParams()

    def f(x):
        out = fbp.fused_fusion_block_bp(fbp.to_bp(x), params, _pk(bias),
                                        maskp, dp, 77, (0.25, 0.2), True,
                                        interpret=interp)
        return jnp.sum(jnp.sin(fbp.from_bp(out, B)[:, :, :N]))

    v = jnp.asarray(np.random.default_rng(13).normal(
        size=x.shape).astype(np.float32))
    v = v.at[:, :, N:, :].set(0.0)
    eps = 1e-2
    fd = (float(f(x + eps * v)) - float(f(x - eps * v))) / (2 * eps)
    an = float(jnp.vdot(jax.grad(f)(x), v))
    assert abs(fd - an) < 2e-2 * max(1.0, abs(fd)), (fd, an)


def test_bp_training_per_sample_masks_differ():
    """BP lanes encode (sample, channel): dropout must NOT be shared across
    samples. Feed identical rows for two samples and check their stochastic
    outputs diverge."""
    from jax.experimental.pallas import tpu as pltpu
    x, _, bias, maskp, dp = _inputs(0, seed=15)
    x = jnp.concatenate([x[:1], x[:1]], axis=0)      # sample 1 == sample 0
    dp = jnp.ones((B, 2), jnp.float32)
    params = _params(jax.random.PRNGKey(8))
    out = fbp.fused_fusion_block_bp(fbp.to_bp(x), params, _pk(bias),
                                    maskp, dp, 42, (0.4, 0.4), True,
                                    interpret=pltpu.InterpretParams())
    out = np.asarray(fbp.from_bp(out, B))
    assert np.abs(out[0, :, :N] - out[1, :, :N]).max() > 1e-3


# ---------------------------------------------------------------------------
# Stack-level: FUSION_LAYOUT=bp through the flax modules
# ---------------------------------------------------------------------------


def _crstb_apply(layout, monkeypatch, deterministic=True):
    """Build a depth-2 CRSTB (scanned pair path: BasicLayerFusion x2 +
    CrossBasicLayer + residuals) and run it under the given FUSION_LAYOUT."""
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops.attention import set_fused_attention

    monkeypatch.setattr(sf, "_LAYOUT", layout)
    block = sf.CRSTB(dim=C, input_resolution=(RES, RES), depth=2,
                     num_heads=H, window_size=WS,
                     drop=0.0 if deterministic else 0.1,
                     attn_drop=0.0 if deterministic else 0.1,
                     drop_path=(0.0, 0.1) if not deterministic else (0.0, 0.0))
    x = jnp.asarray(np.random.default_rng(21).normal(
        size=(B, RES * RES, C)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(22).normal(
        size=(B, RES * RES, C)).astype(np.float32))
    set_fused_attention(True)
    try:
        v = block.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1),
                        "droppath": jax.random.PRNGKey(2)}, x, y,
                       deterministic=True)

        def loss(v, x, y):
            ox, oy = block.apply(v, x, y, deterministic=deterministic,
                                 rngs={"dropout": jax.random.PRNGKey(5),
                                       "droppath": jax.random.PRNGKey(6)})
            return jnp.sum(jnp.sin(ox)) + jnp.sum(jnp.cos(oy))

        val, grads = jax.value_and_grad(loss)(v, x, y)
    finally:
        set_fused_attention(None)
    return val, grads


@pytest.mark.slow
@pytest.mark.parametrize("layout", ["bp", "bpr"])
def test_stack_bp_matches_std(layout, monkeypatch):
    """FUSION_LAYOUT=bp (batch on the lane axis, 2-D streams between blocks)
    and =bpr (window-resident stacks glued by composed-permutation
    transitions) must reproduce the standard layout exactly through a full
    CRSTB: values and parameter gradients (deterministic mode — training
    dropout masks legitimately differ between layouts, the cells draw
    different PRNG streams)."""
    v1, g1 = _crstb_apply("std", monkeypatch)
    v2, g2 = _crstb_apply(layout, monkeypatch)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_stack_bp_training_smoke(monkeypatch):
    """Training mode through the BP stack: runs, finite value and grads."""
    val, grads = _crstb_apply("bp", monkeypatch, deterministic=False)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_stack_xbp_matches_std(monkeypatch):
    """FUSION_LAYOUT=xbp (the plain-XLA twin raced on TPU, VERDICT r4 #3)
    takes the jnp path through the SAME stack wiring even when the fused
    kernels are active — values and grads match the std kernel layout."""
    v1, g1 = _crstb_apply("std", monkeypatch)
    v2, g2 = _crstb_apply("xbp", monkeypatch)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_kernel_grouped_4d_entry_matches_3d():
    """The fused BP kernels accept group-major 4-D streams (the round-5
    stack-residency glue) bitwise-identically to the public 3-D layout."""
    import jax as _jax
    from multimodal_neuroimage_tpu.ops import fusion_block as fb
    from multimodal_neuroimage_tpu.ops import fusion_block_bp as fbp
    from multimodal_neuroimage_tpu.nn.swin2d import (relative_position_index,
                                                     shift_attn_mask)
    Bn = 16                                     # ngroups=2 at G=8
    N = WS * WS
    NP = fb.round_up(N, 8)
    nW = (RES // WS) ** 2
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.normal(size=(nW, NP, Bn * C)), jnp.float32)
    table = jnp.asarray(rng.normal(size=((2 * WS - 1) ** 2, H)) * 0.1,
                        jnp.float32)
    bias = fb.packed_bias_from_table(table, WS, H, NP,
                                     relative_position_index(WS, WS))
    mask = np.pad(shift_attn_mask(RES, RES, WS, WS // 2),
                  ((0, 0), (0, NP - N), (0, NP - N)))
    dp = jnp.ones((Bn, 2), jnp.float32)
    params = tuple(jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)
                   for s in fb.param_shapes(C, 4 * C, cross=False))
    ngroups = Bn // fbp.group_size(Bn)
    x4 = fbp._to_groups(x3, ngroups)

    def loss(x):
        return jnp.sum(fbp.fused_fusion_block_bp(
            x, params, bias, mask, dp, 7, (0.0, 0.0), True,
            interpret=True) ** 2)

    o3 = fbp.fused_fusion_block_bp(x3, params, bias, mask, dp, 7,
                                   (0.0, 0.0), True, interpret=True)
    o4 = fbp.fused_fusion_block_bp(x4, params, bias, mask, dp, 7,
                                   (0.0, 0.0), True, interpret=True)
    assert o4.shape == x4.shape
    np.testing.assert_array_equal(np.asarray(fbp._to_groups(o3, ngroups)),
                                  np.asarray(o4))
    g3 = _jax.grad(loss)(x3)
    g4 = _jax.grad(loss)(x4)
    np.testing.assert_array_equal(np.asarray(fbp._to_groups(g3, ngroups)),
                                  np.asarray(g4))


@pytest.mark.slow
@pytest.mark.parametrize("layout", ["bp", "bpr"])
def test_backbone_group_residency_matches_std(layout, monkeypatch):
    """Whole-pipeline group-major residency (SwinFusionBackbone keeps the
    inter-stage streams in (ngroups, L, G*C); GroupLaneNorm normalizes the
    C-lane blocks in place) must reproduce the std token-major pipeline:
    values and parameter gradients, deterministic mode."""
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.models.swinfusion_net import (
        SwinFusionBackbone)
    from multimodal_neuroimage_tpu.ops.attention import set_fused_attention

    Bn = 4
    monkeypatch.setenv("FUSION_BP_GROUP", "2")      # ngroups=2 at B=4
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(size=(Bn, 84, 84)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Bn, 84, 84)).astype(np.float32))

    def run(lay):
        monkeypatch.setattr(sf, "_LAYOUT", lay)
        net = SwinFusionBackbone(ex_depths=(2,), fusion_depths=(2,),
                                 re_depths=(2,), ex_heads=(6,),
                                 fusion_heads=(6,), re_heads=(6,),
                                 drop_rate=0.0, attn_drop_rate=0.0,
                                 drop_path_rate=0.0)
        set_fused_attention(True)
        try:
            v = net.init(jax.random.PRNGKey(0), a, b, deterministic=True)

            def loss(v, a, b):
                return jnp.sum(jnp.sin(net.apply(
                    v, a, b, deterministic=True)))

            return jax.value_and_grad(loss)(v, a, b)
        finally:
            set_fused_attention(None)

    v1, g1 = run("std")
    v2, g2 = run(layout)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-5)
    for a_, b_ in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_group_lane_norm_matches_layernorm():
    """GroupLaneNorm's grouped path equals its token-major path (which is
    flax LayerNorm semantics) after relayout."""
    import multimodal_neuroimage_tpu.nn.swinfusion as sf

    rng = np.random.default_rng(3)
    Bn, L, C, G = 4, 36, 12, 2
    x = jnp.asarray(rng.normal(size=(Bn, L, C)).astype(np.float32))
    ln = sf.GroupLaneNorm(C)
    v = ln.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(
        lambda t: jnp.asarray(rng.normal(size=t.shape), t.dtype), v)
    ref = ln.apply(v, x, False)
    ngroups = Bn // G
    xg = jnp.transpose(x.reshape(ngroups, G, L, C),
                       (0, 2, 1, 3)).reshape(ngroups, L, G * C)
    out = ln.apply(v, xg, True)
    back = jnp.transpose(out.reshape(ngroups, L, G, C),
                         (0, 2, 1, 3)).reshape(Bn, L, C)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("layout", ["bp", "bpr"])
def test_stack_odd_depth_matches_std(layout, monkeypatch):
    """Odd depths use the unrolled path (per-block transitions + exit from
    the last block's shift layout in bpr). Depth 3 exercises a trailing
    shift-0 block after a shifted one."""
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops.attention import set_fused_attention

    x = jnp.asarray(np.random.default_rng(31).normal(
        size=(B, RES * RES, C)).astype(np.float32))

    def run(lay):
        monkeypatch.setattr(sf, "_LAYOUT", lay)
        layer = sf.BasicLayerFusion(dim=C, input_resolution=(RES, RES),
                                    depth=3, num_heads=H, window_size=WS,
                                    drop_path=(0.0, 0.0, 0.0))
        set_fused_attention(True)
        try:
            v = layer.init(jax.random.PRNGKey(0), x, deterministic=True)

            def loss(v, x):
                return jnp.sum(jnp.sin(layer.apply(v, x,
                                                   deterministic=True)))

            return jax.value_and_grad(loss)(v, x)
        finally:
            set_fused_attention(None)

    v1, g1 = run("std")
    v2, g2 = run(layout)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_transition_permutation_gather_only_vjp():
    """transition_permutation_fn must (a) be a bijection whose valid rows
    reproduce window_transition_indices exactly, (b) have a VJP that is the
    inverse gather — identical to the scatter-add VJP of the jnp.take path
    whenever pad-row cotangents are zero (the resident-stack invariant),
    and (c) contain no scatter in its backward jaxpr."""
    from multimodal_neuroimage_tpu.nn.common import (
        transition_permutation_fn, window_transition_indices)

    Hh, Ww, s_from, s_to = RES, RES, 0, WS // 2
    permute = transition_permutation_fn(Hh, Ww, WS, s_from, s_to, NP)
    idx_old = np.asarray(window_transition_indices(Hh, Ww, WS,
                                                   s_from, s_to, NP))
    rows = np.arange(NW * NP)
    valid = (rows % NP) < N

    x = jnp.asarray(np.random.default_rng(7).normal(size=(NW * NP, 8)),
                    jnp.float32)
    new = np.asarray(permute(x))
    old = np.asarray(jnp.take(x, jnp.asarray(idx_old), axis=0))
    np.testing.assert_array_equal(new[valid], old[valid])

    # VJP parity under zero pad cotangent
    g = np.random.default_rng(8).normal(size=new.shape).astype(np.float32)
    g[~valid] = 0.0
    g = jnp.asarray(g)
    (dx_new,) = jax.vjp(permute, x)[1](g)
    (dx_old,) = jax.vjp(
        lambda t: jnp.take(t, jnp.asarray(idx_old), axis=0), x)[1](g)
    np.testing.assert_array_equal(np.asarray(dx_new), np.asarray(dx_old))

    jaxpr = str(jax.make_jaxpr(
        lambda t: jax.vjp(permute, t)[1](g))(x))
    assert "scatter" not in jaxpr


# ---------------------------------------------------------------------------
# Batch-GROUP grid (B > G): lane fold capped, groups ride the grid
# ---------------------------------------------------------------------------


def _inputs_b(Bn, shift=0, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(Bn, NW, NP, C)).astype(np.float32)
    x[:, :, N:, :] = 0.0
    table = jnp.asarray(
        rng.normal(size=((2 * WS - 1) ** 2, H)).astype(np.float32) * 0.1)
    bias = fb.combined_bias(table, WS, H, NP, relative_position_index(WS, WS))
    mask = shift_attn_mask(RES, RES, WS, shift)
    maskp = (None if mask is None
             else np.pad(mask, ((0, 0), (0, NP - N), (0, NP - N))))
    dp = jnp.asarray(rng.uniform(0.7, 1.3, size=(Bn, 2)), jnp.float32)
    return jnp.asarray(x), bias, maskp, dp


@pytest.mark.parametrize("Bn,cap", [(4, 2), (16, 8), (32, 8)])
def test_bp_group_grid_forward_parity(Bn, cap, monkeypatch):
    """B > FUSION_BP_GROUP splits into ngroups lane groups on the grid;
    values must match the std reference exactly (the O(B^2) -> O(B) fix,
    ROADMAP round-3 matrix / VERDICT r3 #2)."""
    monkeypatch.setenv("FUSION_BP_GROUP", str(cap))
    x, bias, maskp, dp = _inputs_b(Bn, shift=3, seed=40 + Bn)
    assert fbp.group_size(Bn) == cap and Bn // cap > 1
    params = _params(jax.random.PRNGKey(4))
    got = fbp.from_bp(
        fbp.fused_fusion_block_bp(fbp.to_bp(x), params, _pk(bias), maskp,
                                  dp, 0, (0.0, 0.0), False, interpret=True),
        Bn)
    want = fb.fusion_block_reference(x, params, bias, maskp, dp)
    np.testing.assert_allclose(np.asarray(got)[:, :, :N],
                               np.asarray(want)[:, :, :N],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("Bn,cap", [(16, 8)])
def test_bp_group_grid_grad_parity(Bn, cap, monkeypatch):
    """Gradients across groups: param/bias grads accumulate over ALL grid
    cells (groups included) and must match the std reference."""
    monkeypatch.setenv("FUSION_BP_GROUP", str(cap))
    x, bias, maskp, dp = _inputs_b(Bn, shift=3, seed=50)
    params = _params(jax.random.PRNGKey(5))
    cot = jnp.asarray(np.random.default_rng(51).normal(
        size=x.shape).astype(np.float32))
    cot = cot.at[:, :, N:, :].set(0.0)

    def loss_bp(x, params, bias):
        out = fbp.fused_fusion_block_bp(fbp.to_bp(x), params, _pk(bias),
                                        maskp, dp, 0, (0.0, 0.0), False,
                                        interpret=True)
        return jnp.sum(fbp.from_bp(out, Bn) * cot)

    def loss_ref(x, params, bias):
        return jnp.sum(fb.fusion_block_reference(x, params, bias, maskp, dp)
                       * cot)

    gf = jax.grad(loss_bp, argnums=(0, 1, 2))(x, params, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, params, bias)
    np.testing.assert_allclose(np.asarray(gf[0])[:, :, :N],
                               np.asarray(gr[0])[:, :, :N],
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(gf[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[2])[:, :N, :N],
                               np.asarray(gr[2])[:, :N, :N],
                               rtol=1e-4, atol=1e-4)


def test_bp_group_grid_cross_parity(monkeypatch):
    monkeypatch.setenv("FUSION_BP_GROUP", "4")
    Bn = 8                                          # ngroups = 2
    x, bias, maskp, dp = _inputs_b(Bn, shift=3, seed=60)
    y, *_ = _inputs_b(Bn, shift=3, seed=61)
    params = _params(jax.random.PRNGKey(6), cross=True)
    cot = jnp.asarray(np.random.default_rng(62).normal(
        size=x.shape).astype(np.float32))
    cot = cot.at[:, :, N:, :].set(0.0)

    def loss_bp(x, y, params):
        out = fbp.fused_cross_fusion_block_bp(
            fbp.to_bp(x), fbp.to_bp(y), params, _pk(bias), maskp, dp, 0,
            (0.0, 0.0), False, interpret=True)
        return jnp.sum(fbp.from_bp(out, Bn) * cot)

    def loss_ref(x, y, params):
        return jnp.sum(fb.cross_fusion_block_reference(
            x, y, params, bias, maskp, dp) * cot)

    vf, gf = jax.value_and_grad(loss_bp, argnums=(0, 1, 2))(x, y, params)
    vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, y, params)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    for name, a, b in (("dx", gf[0], gr[0]), ("dy", gf[1], gr[1])):
        np.testing.assert_allclose(np.asarray(a)[:, :, :N],
                                   np.asarray(b)[:, :, :N],
                                   rtol=1e-4, atol=1e-4, err_msg=name)
    for a, b in zip(gf[2], gr[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bp_group_grid_dropout_masks_differ_across_groups(monkeypatch):
    """Group lane offsets feed the dropout hash: identical subjects placed
    in DIFFERENT groups must draw different masks (col0/m0 offsets)."""
    from jax.experimental.pallas import tpu as pltpu
    monkeypatch.setenv("FUSION_BP_GROUP", "2")
    Bn = 4
    x, bias, maskp, _ = _inputs_b(Bn, shift=0, seed=70)
    xs = jnp.broadcast_to(x[:1], x.shape)           # all subjects identical
    dp = jnp.ones((Bn, 2), jnp.float32)
    params = _params(jax.random.PRNGKey(7))
    out = fbp.fused_fusion_block_bp(fbp.to_bp(xs), params, _pk(bias),
                                    maskp, dp, 42, (0.4, 0.4), True,
                                    interpret=pltpu.InterpretParams())
    out = np.asarray(fbp.from_bp(out, Bn))
    # subjects 0/1 share group 0; subject 2 lives in group 1
    assert np.abs(out[0, :, :N] - out[2, :, :N]).max() > 1e-3
    assert np.abs(out[0, :, :N] - out[1, :, :N]).max() > 1e-3


@pytest.mark.slow
def test_stack_bp_group_matches_std(monkeypatch):
    """Full CRSTB stack at B=8 with the fold capped at G=4 (ngroups=2):
    the batch-group grid must be invisible at the module level."""
    monkeypatch.setenv("FUSION_BP_GROUP", "4")
    global B
    prev = B
    B = 8
    try:
        v1, g1 = _crstb_apply("std", monkeypatch)
        v2, g2 = _crstb_apply("bp", monkeypatch)
    finally:
        B = prev
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    # grads: the group grid accumulates param grads over ngroups x more
    # grid cells, reordering the f32 sums vs the std layout (measured max
    # rel drift 5e-4 on 2/432 elements) — a looser tolerance than the
    # single-group stack test, same math
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_bp_mm16_forward_close_to_f32():
    """bf16 streams flip the kernels' dots to bf16 operands (FUSION_MM16,
    the v5e MXU fast path); output must track the f32 oracle within bf16
    tolerance, and the f32-input path must remain bitwise-exactly the
    always-f32 kernel (the parity tests above depend on that)."""
    x, _, bias, maskp, dp = _inputs(3)
    params = _params(jax.random.PRNGKey(1))
    want = fb.fusion_block_reference(x, params, bias, maskp, dp)
    got_bp16 = fbp.fused_fusion_block_bp(
        fbp.to_bp(x).astype(jnp.bfloat16), params, _pk(bias), maskp, dp,
        0, (0.0, 0.0), False, interpret=True)
    got16 = fbp.from_bp(got_bp16, B).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got16)[:, :, :N],
                               np.asarray(want)[:, :, :N],
                               rtol=5e-2, atol=5e-2)


def test_bp_mm16_grad_finite_and_close():
    """bf16-dot backward: gradients stay finite and within bf16 tolerance of
    the f32 kernel's gradients (same inputs, same masks — dropout off)."""
    x, _, bias, maskp, dp = _inputs(0)
    params = _params(jax.random.PRNGKey(2))
    cot = jnp.asarray(np.random.default_rng(5).normal(
        size=fbp.to_bp(x).shape).astype(np.float32))

    def loss(xx, params, dtype):
        out = fbp.fused_fusion_block_bp(xx.astype(dtype), params, _pk(bias),
                                        maskp, dp, 0, (0.0, 0.0), False,
                                        interpret=True)
        return jnp.sum(out.astype(jnp.float32) * cot)

    g32 = jax.grad(loss, argnums=(0, 1))(fbp.to_bp(x), params, jnp.float32)
    g16 = jax.grad(loss, argnums=(0, 1))(fbp.to_bp(x), params, jnp.bfloat16)
    gx32, gx16 = np.asarray(g32[0]), np.asarray(g16[0], np.float32)
    assert np.all(np.isfinite(gx16))
    scale = np.abs(gx32).max() + 1e-6
    np.testing.assert_allclose(gx16 / scale, gx32 / scale, atol=6e-2)
    for a, b in zip(g16[1], g32[1]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b)
        assert np.all(np.isfinite(a))
        s = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / s, b / s, atol=6e-2)
