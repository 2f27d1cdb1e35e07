"""Pallas fused attention: interpret-mode parity with the einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_neuroimage_tpu.ops.attention import (attention_reference,
                                                     fused_attention)

B, H, T, D = 2, 3, 37, 8


@pytest.fixture
def qkv():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    return mk(), mk(), mk()


def test_forward_parity(qkv):
    q, k, v = qkv
    got = fused_attention(q, k, v, jnp.asarray(0, jnp.int32), 0.0,
                          interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_backward_parity(qkv):
    q, k, v = qkv

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, jnp.asarray(0, jnp.int32),
                                       0.0, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_bert_layer_uses_fused_path_equivalently(qkv):
    """BertLayer (attention-only kernel path, t_valid=None) output identical
    with the kernel forced on (interpret) vs off, deterministic mode."""
    from multimodal_neuroimage_tpu.nn.bert import BertLayer
    from multimodal_neuroimage_tpu.ops import attention as A
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 16, 24)).astype(np.float32))
    mod = BertLayer(hidden=24, heads=4, intermediate=64)
    params = mod.init(jax.random.PRNGKey(0), x)
    base = mod.apply(params, x, deterministic=True)

    real_fused = A.fused_attention
    A.set_fused_attention(True)
    # route the kernel through interpret mode on CPU
    def interp(q, k, v, seed, rate):
        return real_fused(q, k, v, seed, rate, interpret=True)
    A.fused_attention, orig = interp, real_fused
    try:
        import multimodal_neuroimage_tpu.nn.bert as bert_mod
        got = mod.apply(params, x, deterministic=True)
    finally:
        A.fused_attention = orig
        A.set_fused_attention(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)


def test_window_attention_bias_mask_parity():
    from multimodal_neuroimage_tpu.ops.attention import fused_window_attention
    rng = np.random.default_rng(2)
    B, nW, H, N, D = 2, 4, 3, 16, 8
    q = jnp.asarray(rng.normal(size=(B, nW, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nW, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nW, H, N, D)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.uniform(size=(nW, N, N)) > 0.8, -100.0, 0.0)
        .astype(np.float32))

    got = fused_window_attention(q, k, v, bias, mask, interpret=True)
    s = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k)
    s = s + bias[None, None] + mask[None, :, None]
    ref = jnp.einsum("bwhnm,bwhmd->bwhnd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_window_attention_backward_parity():
    from multimodal_neuroimage_tpu.ops.attention import fused_window_attention
    rng = np.random.default_rng(3)
    B, nW, H, N, D = 1, 2, 2, 9, 4
    q = jnp.asarray(rng.normal(size=(B, nW, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, nW, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nW, H, N, D)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32))

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_window_attention(q, k, v, bias,
                                              interpret=True) ** 2)

    def loss_ref(q, k, v, bias):
        s = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k) + bias[None, None]
        out = jnp.einsum("bwhnm,bwhmd->bwhnd", jax.nn.softmax(s, -1), v)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
