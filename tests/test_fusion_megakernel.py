"""Parity tests for the fused SwinFusion block megakernel
(ops/fusion_block.py) against its pure-jnp twin and the FusionBlock module's
plain path. Runs in Pallas interpreter mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_neuroimage_tpu.nn.swin2d import (relative_position_index,
                                                 shift_attn_mask)
from multimodal_neuroimage_tpu.ops import fusion_block as fb
from multimodal_neuroimage_tpu.ops.attention import set_fused_attention

B, RES, WS, C, H = 2, 12, 6, 12, 6
N = WS * WS
NP = fb.round_up(N, 8)
NW = (RES // WS) ** 2
HID = 4 * C


def _params(key):
    ks = jax.random.split(key, 12)
    shapes = fb.param_shapes(C, HID, cross=False)
    scale = [0.3] * 12
    p = [jax.random.normal(k, s, jnp.float32) * sc
         for k, s, sc in zip(ks, shapes, scale)]
    p[0] = jnp.abs(p[0]) + 0.5          # LN scales positive
    p[6] = jnp.abs(p[6]) + 0.5
    return tuple(p)



def _pk(bias):
    """(H, NP, NP) -> head-packed (NP, L) kernel bias layout."""
    return jnp.transpose(jnp.asarray(bias, jnp.float32),
                         (1, 0, 2)).reshape(NP, H * NP)

def _inputs(shift=0, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, NW, NP, C)).astype(np.float32)
    x[:, :, N:, :] = 0.0                # pad rows zero on entry
    table = jnp.asarray(
        rng.normal(size=((2 * WS - 1) ** 2, H)).astype(np.float32) * 0.1)
    rel_idx = relative_position_index(WS, WS)
    bias = fb.combined_bias(table, WS, H, NP, rel_idx)
    mask = shift_attn_mask(RES, RES, WS, shift)
    maskp = (None if mask is None
             else np.pad(mask, ((0, 0), (0, NP - N), (0, NP - N))))
    dp = jnp.asarray([[1.25, 0.8], [1.0, 1.0]], jnp.float32)
    return jnp.asarray(x), table, bias, maskp, dp


@pytest.mark.parametrize("shift", [0, 3])
def test_fused_block_forward_parity(shift):
    x, _, bias, maskp, dp = _inputs(shift)
    params = _params(jax.random.PRNGKey(1))
    got = fb.fused_fusion_block(x, params, _pk(bias), maskp, dp, 0, (0.0, 0.0),
                                False, interpret=True)
    want = fb.fusion_block_reference(x, params, bias, maskp, dp)
    np.testing.assert_allclose(np.asarray(got)[:, :, :N],
                               np.asarray(want)[:, :, :N],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shift", [0, 3])
def test_fused_block_grad_parity(shift):
    x, _, bias, maskp, dp = _inputs(shift, seed=3)
    params = _params(jax.random.PRNGKey(2))
    cot = jnp.asarray(
        np.random.default_rng(7).normal(size=x.shape).astype(np.float32))
    cot = cot.at[:, :, N:, :].set(0.0)   # real usage: pads get no cotangent

    def loss_fused(x, params, bias):
        out = fb.fused_fusion_block(x, params, _pk(bias), maskp, dp, 0,
                                    (0.0, 0.0), False, interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(x, params, bias):
        out = fb.fusion_block_reference(x, params, bias, maskp, dp)
        return jnp.sum(out * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, params, bias)
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


def _module_apply(fused: bool, deterministic=True, rates=(0.0, 0.0),
                  drop_path=0.0, shift=3):
    from multimodal_neuroimage_tpu.nn.swinfusion import FusionBlock
    set_fused_attention(fused)
    try:
        block = FusionBlock(dim=C, input_resolution=(RES, RES), num_heads=H,
                            window_size=WS, shift_size=shift,
                            attn_drop=rates[0], drop=rates[1],
                            drop_path=drop_path)
        x = jnp.asarray(np.random.default_rng(11).normal(
            size=(B, RES * RES, C)).astype(np.float32))
        variables = block.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "droppath": jax.random.PRNGKey(2)}, x, deterministic=True)

        def apply(v, x):
            return block.apply(v, x, deterministic=deterministic,
                               rngs={"dropout": jax.random.PRNGKey(5),
                                     "droppath": jax.random.PRNGKey(6)})
        return variables, apply, x
    finally:
        set_fused_attention(None)


@pytest.mark.parametrize("shift", [0, 3])
def test_module_fused_vs_plain(shift):
    v_f, apply_f, x = _module_apply(True, shift=shift)
    set_fused_attention(True)
    try:
        out_f = apply_f(v_f, x)
    finally:
        set_fused_attention(None)
    v_p, apply_p, _ = _module_apply(False, shift=shift)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a).shape,
                                                   np.asarray(b).shape),
        v_f, v_p)
    set_fused_attention(False)
    try:
        out_p = apply_p(v_f, x)       # same params through the plain path
    finally:
        set_fused_attention(None)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_module_grad_fused_vs_plain():
    v, apply_f, x = _module_apply(True)

    def make_loss(fused):
        def loss(v, x):
            set_fused_attention(fused)
            try:
                return jnp.sum(jnp.tanh(apply_f(v, x)))
            finally:
                set_fused_attention(None)
        return loss

    gf = jax.grad(make_loss(True))(v, x)
    gp = jax.grad(make_loss(False))(v, x)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_p = {jax.tree_util.keystr(k): a
              for k, a in jax.tree_util.tree_leaves_with_path(gp)}
    for k, a in flat_f:
        b = flat_p[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_block_training_stochastic_smoke():
    """Dropout + DropPath active through the kernel: finite outputs/grads,
    distribution roughly preserved (inverted-dropout scaling)."""
    x, _, bias, maskp, dp = _inputs(3, seed=5)
    params = _params(jax.random.PRNGKey(4))

    from jax.experimental.pallas import tpu as pltpu
    mosaic_interp = pltpu.InterpretParams()

    def loss(x):
        out = fb.fused_fusion_block(x, params, _pk(bias), maskp, dp, 123,
                                    (0.3, 0.2), True,
                                    interpret=mosaic_interp)
        return jnp.sum(out ** 2), out

    (val, out), g = jax.value_and_grad(loss, has_aux=True)(x)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    det = fb.fused_fusion_block(x, params, _pk(bias), maskp, dp, 123,
                                (0.0, 0.0), False, interpret=True)
    ratio = float(jnp.std(out[:, :, :N]) / jnp.std(det[:, :, :N]))
    assert 0.5 < ratio < 2.0


def _cross_params(key):
    ks = jax.random.split(key, 16)
    shapes = fb.param_shapes(C, HID, cross=True)
    p = [jax.random.normal(k, s, jnp.float32) * 0.3
         for k, s in zip(ks, shapes)]
    for i in (0, 2, 10):                # LN scales positive
        p[i] = jnp.abs(p[i]) + 0.5
    return tuple(p)


@pytest.mark.parametrize("shift", [0, 3])
def test_fused_cross_block_parity(shift):
    x, _, bias, maskp, dp = _inputs(shift, seed=21)
    y = jnp.asarray(np.random.default_rng(22).normal(
        size=x.shape).astype(np.float32))
    y = y.at[:, :, N:, :].set(0.0)
    params = _cross_params(jax.random.PRNGKey(9))
    got = fb.fused_cross_fusion_block(x, y, params, _pk(bias), maskp, dp, 0,
                                      (0.0, 0.0), False, interpret=True)
    want = fb.cross_fusion_block_reference(x, y, params, bias, maskp, dp)
    np.testing.assert_allclose(np.asarray(got)[:, :, :N],
                               np.asarray(want)[:, :, :N],
                               rtol=2e-5, atol=2e-5)


def test_fused_cross_block_grad_parity():
    x, _, bias, maskp, dp = _inputs(3, seed=31)
    y = jnp.asarray(np.random.default_rng(32).normal(
        size=x.shape).astype(np.float32))
    y = y.at[:, :, N:, :].set(0.0)
    params = _cross_params(jax.random.PRNGKey(10))
    cot = jnp.asarray(
        np.random.default_rng(33).normal(size=x.shape).astype(np.float32))
    cot = cot.at[:, :, N:, :].set(0.0)

    def loss_fused(x, y, params, bias):
        out = fb.fused_cross_fusion_block(x, y, params, _pk(bias), maskp, dp, 0,
                                          (0.0, 0.0), False, interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(x, y, params, bias):
        out = fb.cross_fusion_block_reference(x, y, params, bias, maskp, dp)
        return jnp.sum(out * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, y, params, bias)
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


@pytest.mark.parametrize("shift", [0, 3])
def test_cross_module_fused_vs_plain(shift):
    from multimodal_neuroimage_tpu.nn.swinfusion import CrossFusionBlock
    block = CrossFusionBlock(dim=C, input_resolution=(RES, RES), num_heads=H,
                             window_size=WS, shift_size=shift)
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.normal(size=(B, RES * RES, C)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, RES * RES, C)).astype(np.float32))
    v = block.init({"params": jax.random.PRNGKey(0)}, x, y,
                   deterministic=True)
    set_fused_attention(True)
    try:
        fx, fy = block.apply(v, x, y, deterministic=True)
    finally:
        set_fused_attention(None)
    set_fused_attention(False)
    try:
        px, py = block.apply(v, x, y, deterministic=True)
    finally:
        set_fused_attention(None)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(px),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(py),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_block_stochastic_grad_is_true_gradient():
    """With a FIXED seed the stochastic forward is deterministic, so the
    custom VJP must match its directional numerical derivative. Catches
    fwd/bwd dropout-mask divergence (e.g. mismatched grids)."""
    from jax.experimental.pallas import tpu as pltpu
    x, _, bias, maskp, dp = _inputs(3, seed=9)
    params = _params(jax.random.PRNGKey(6))
    interp = pltpu.InterpretParams()

    def f(x):
        out = fb.fused_fusion_block(x, params, _pk(bias), maskp, dp, 77,
                                    (0.25, 0.2), True, interpret=interp)
        return jnp.sum(jnp.sin(out[:, :, :N]))

    v = jnp.asarray(np.random.default_rng(13).normal(
        size=x.shape).astype(np.float32))
    v = v.at[:, :, N:, :].set(0.0)
    eps = 1e-2
    fd = (float(f(x + eps * v)) - float(f(x - eps * v))) / (2 * eps)
    an = float(jnp.vdot(jax.grad(f)(x), v))
    assert abs(fd - an) < 2e-2 * max(1.0, abs(fd)), (fd, an)


@pytest.mark.parametrize("cross", [False, True])
def test_chunk_invariant_dropout(cross, monkeypatch):
    """Hash-keyed dropout masks must be identical under ANY window-chunk
    choice — the property that lets forward and backward kernels each pick
    their own grid (ops/fusion_block.py _hash_keep*). Forced to "hash" mask
    mode: the default "prng" mode instead pins fwd/bwd to one grid (masks
    there legitimately change when the chunk size does)."""
    monkeypatch.setattr(fb, "_MASK_MODE", "hash")
    x, _, bias, maskp, dp = _inputs(shift=0, seed=5)
    y = jnp.asarray(
        np.random.default_rng(9).normal(size=x.shape).astype(np.float32))
    params = _params_cross(jax.random.PRNGKey(4)) if cross else \
        _params(jax.random.PRNGKey(4))
    rates = (0.3, 0.25)
    cot = jnp.asarray(
        np.random.default_rng(11).normal(size=x.shape).astype(np.float32))

    def run():
        if cross:
            def loss(x, y, params):
                out = fb.fused_cross_fusion_block(
                    x, y, params, _pk(bias), maskp, dp, 123, rates, True,
                    interpret=True)
                return jnp.sum(out * cot)
            v, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, y, params)
        else:
            def loss(x, params):
                out = fb.fused_fusion_block(
                    x, params, _pk(bias), maskp, dp, 123, rates, True,
                    interpret=True)
                return jnp.sum(out * cot)
            v, g = jax.value_and_grad(loss, argnums=(0, 1))(x, params)
        return v, g

    v1, g1 = run()
    # force every kernel to chunk differently (NW=4 -> chunks 1 vs 2/4)
    small = {k: 21 * 1024 for k in fb._CHUNK_BUDGETS}   # -> Wc = 1
    monkeypatch.setattr(fb, "_CHUNK_BUDGETS", small)
    v2, g2 = run()
    # different chunk shapes reorder fp accumulation; a wrong mask would
    # differ at O(1), so 1e-3 tolerances still catch mask divergence
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def _params_cross(key):
    ks = jax.random.split(key, 16)
    shapes = fb.param_shapes(C, HID, cross=True)
    p = [jax.random.normal(k, s, jnp.float32) * 0.3
         for k, s in zip(ks, shapes)]
    for i in (0, 2, 10):                 # LN scales positive
        p[i] = jnp.abs(p[i]) + 0.5
    return tuple(p)


@pytest.mark.parametrize("training", [False, True])
def test_glue_perm_matches_chain(training, monkeypatch):
    """FUSION_GLUE=perm (one gather each way, pad rows carrying token-0
    values) must reproduce the roll/partition/pad chain exactly — values and
    gradients — through the fused FusionBlock, deterministic and training."""
    import multimodal_neuroimage_tpu.nn.swinfusion as sf

    rates = (0.2, 0.15) if training else (0.0, 0.0)

    def run(mode):
        monkeypatch.setattr(sf, "_GLUE_MODE", mode)
        v, apply_f, x = _module_apply(True, deterministic=not training,
                                      rates=rates, shift=3)
        set_fused_attention(True)
        try:
            def loss(x):
                out = apply_f(v, x)
                return jnp.sum(jnp.sin(out))
            val, g = jax.value_and_grad(loss)(x)
        finally:
            set_fused_attention(None)
        return val, g

    v1, g1 = run("chain")
    v2, g2 = run("perm")
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)
