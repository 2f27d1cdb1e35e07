"""Parity tests for the fused BERT layer megakernel (ops/bert_layer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_neuroimage_tpu.ops import bert_layer as bl
from multimodal_neuroimage_tpu.ops.attention import set_fused_attention

B, T, H, HEADS, F = 2, 37, 24, 4, 256
TP = bl.round_up(T, 8)


def _params(key):
    ks = jax.random.split(key, 16)
    shapes = bl.param_shapes(H, F)
    p = [jax.random.normal(k, s, jnp.float32) * 0.15
         for k, s in zip(ks, shapes)]
    p[8] = jnp.abs(p[8]) + 0.5          # LN scales positive
    p[14] = jnp.abs(p[14]) + 0.5
    return tuple(p)


def _x(seed=0):
    x = np.random.default_rng(seed).normal(
        size=(B, TP, H)).astype(np.float32)
    x[:, T:, :] = 0.0
    return jnp.asarray(x)


@pytest.mark.parametrize("grid_mode", ["subject", "batched"])
def test_bert_layer_forward_parity(grid_mode, monkeypatch):
    monkeypatch.setattr(bl, "_GRID_MODE", grid_mode)
    x = _x()
    params = _params(jax.random.PRNGKey(1))
    got = bl.bert_layer_call(x, params, 0, HEADS, T, (0.0, 0.0), False,
                             interpret=True)
    want = bl.bert_layer_reference(x, params, HEADS, T)
    np.testing.assert_allclose(np.asarray(got)[:, :T], np.asarray(want)[:, :T],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bwd_mode,grid_mode",
                         [("merged", "subject"), ("split", "subject"),
                          ("merged", "batched")])
def test_bert_layer_grad_parity(bwd_mode, grid_mode, monkeypatch):
    # all backward plans stay covered (BERT_BWD/BERT_GRID env pins, ADVICE r2)
    monkeypatch.setattr(bl, "_BWD_MODE", bwd_mode)
    monkeypatch.setattr(bl, "_GRID_MODE", grid_mode)
    x = _x(3)
    params = _params(jax.random.PRNGKey(2))
    cot = jnp.asarray(np.random.default_rng(7).normal(
        size=x.shape).astype(np.float32)).at[:, T:, :].set(0.0)

    def loss_fused(x, params):
        out = bl.bert_layer_call(x, params, 0, HEADS, T, (0.0, 0.0), False,
                                 interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(x, params):
        return jnp.sum(bl.bert_layer_reference(x, params, HEADS, T) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gf[0])[:, :T],
                               np.asarray(gr[0])[:, :T],
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(gf[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_bert_encoder_fused_vs_plain():
    """Full BertEncoder: megakernel path (padded scan) equals plain path."""
    from multimodal_neuroimage_tpu.nn.bert import BertEncoder
    enc = BertEncoder(hidden=H, layers=3, heads=HEADS, max_positions=T,
                      intermediate=F)
    x = jnp.asarray(np.random.default_rng(11).normal(
        size=(B, T, H)).astype(np.float32))
    v = enc.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    set_fused_attention(True)
    try:
        seq_f, pooled_f = enc.apply(v, x, deterministic=True)
    finally:
        set_fused_attention(None)
    set_fused_attention(False)
    try:
        seq_p, pooled_p = enc.apply(v, x, deterministic=True)
    finally:
        set_fused_attention(None)
    np.testing.assert_allclose(np.asarray(seq_f), np.asarray(seq_p),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled_f), np.asarray(pooled_p),
                               rtol=3e-5, atol=3e-5)


def test_bert_layer_training_stochastic_smoke():
    from jax.experimental.pallas import tpu as pltpu
    x = _x(5)
    params = _params(jax.random.PRNGKey(4))
    interp = pltpu.InterpretParams()

    def loss(x):
        out = bl.bert_layer_call(x, params, 123, HEADS, T, (0.2, 0.15), True,
                                 interpret=interp)
        return jnp.sum(out ** 2), out

    (val, out), g = jax.value_and_grad(loss, has_aux=True)(x)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    det = bl.bert_layer_call(x, params, 123, HEADS, T, (0.0, 0.0), False,
                             interpret=True)
    ratio = float(jnp.std(out[:, :T]) / jnp.std(det[:, :T]))
    assert 0.5 < ratio < 2.0


@pytest.mark.parametrize("grid_mode", ["subject", "batched"])
def test_bert_layer_stochastic_grad_is_true_gradient(grid_mode, monkeypatch):
    """Fixed-seed stochastic forward is deterministic; custom VJP must match
    its directional numerical derivative (catches fwd/bwd mask divergence —
    including across the two grid plans, whose masks are keyed differently)."""
    from jax.experimental.pallas import tpu as pltpu
    monkeypatch.setattr(bl, "_GRID_MODE", grid_mode)
    x = _x(9)
    params = _params(jax.random.PRNGKey(8))
    interp = pltpu.InterpretParams()

    def f(x):
        out = bl.bert_layer_call(x, params, 55, HEADS, T, (0.25, 0.2), True,
                                 interpret=interp)
        return jnp.sum(jnp.sin(out[:, :T]))

    v = jnp.asarray(np.random.default_rng(14).normal(
        size=x.shape).astype(np.float32)).at[:, T:, :].set(0.0)
    eps = 1e-2
    fd = (float(f(x + eps * v)) - float(f(x - eps * v))) / (2 * eps)
    an = float(jnp.vdot(jax.grad(f)(x), v))
    assert abs(fd - an) < 2e-2 * max(1.0, abs(fd)), (fd, an)


def test_bert_layer_mm16_force_f32_stream_parity(monkeypatch):
    """The flagship's mixed operating point — f32 residual stream with
    forced-bf16 MXU operands (nn/bert.py BERT_STREAM=f32) — must match the
    f32 reference within bf16 rounding of the dot operands."""
    monkeypatch.setattr(bl, "_GRID_MODE", "subject")
    x = _x()
    params = _params(jax.random.PRNGKey(3))
    cot = jnp.asarray(np.random.default_rng(9).normal(
        size=x.shape).astype(np.float32)).at[:, T:, :].set(0.0)

    def loss(mm16):
        def f(x, params):
            out = bl.bert_layer_call(x, params, 0, HEADS, T, (0.0, 0.0),
                                     False, interpret=True, mm16=mm16)
            return jnp.sum(out * cot)
        return f

    out16 = bl.bert_layer_call(x, params, 0, HEADS, T, (0.0, 0.0), False,
                               interpret=True, mm16=True)
    out32 = bl.bert_layer_call(x, params, 0, HEADS, T, (0.0, 0.0), False,
                               interpret=True, mm16=False)
    # LN-bounded activations are O(1); bf16 dot operands carry 8 mantissa
    # bits. The CHECK is that the mm16 plumbing changes precision, not math
    # (a summed scalar loss would amplify cancellation and prove nothing).
    np.testing.assert_allclose(np.asarray(out16)[:, :T],
                               np.asarray(out32)[:, :T],
                               rtol=0.1, atol=0.05)
    _, (dx16, dp16) = jax.value_and_grad(loss(True), (0, 1))(x, params)
    _, (dx32, dp32) = jax.value_and_grad(loss(False), (0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(dx16), np.asarray(dx32),
                               rtol=0.2, atol=0.05)
    for a, b in zip(dp16, dp32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.2, atol=0.25)


@pytest.mark.parametrize("grid_mode", ["subject", "batched"])
@pytest.mark.parametrize("rates", [(0.0, 0.0), (0.1, 0.1)])
def test_bert_bwd_resid_matches_recompute(grid_mode, rates, monkeypatch):
    """BERT_BWD_RESID (forward-saved ctx/a2, round 4) matches the
    recompute-everything backward to f32 summation-order noise. (Not
    bitwise: the old recompute rebuilt z with the BACKWARD's FFN chunk size
    (256) while the forward accumulates in 768-chunks, so ITS LN2 stats
    carried a ~1e-7 ordering wobble that the saved value does not.)"""
    monkeypatch.setattr(bl, "_GRID_MODE", grid_mode)
    x = _x(5)
    params = _params(jax.random.PRNGKey(4))
    cot = jnp.asarray(np.random.default_rng(9).normal(
        size=x.shape).astype(np.float32)).at[:, T:, :].set(0.0)
    training = rates != (0.0, 0.0)

    def loss(x, params):
        out = bl.bert_layer_call(x, params, 11, HEADS, T, rates, training,
                                 interpret=True)
        return jnp.sum(out * cot)

    grads = {}
    for resid in (True, False):
        monkeypatch.setattr(bl, "_RESID", resid)
        grads[resid] = jax.grad(loss, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(grads[True][0]),
                               np.asarray(grads[False][0]),
                               rtol=5e-5, atol=1e-6)
    for a, b in zip(grads[True][1], grads[False][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)
