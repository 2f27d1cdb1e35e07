"""SwinV2 encoder: shape contracts, window mechanics, mask correctness.

Mirrors the runtime assertions the reference relies on
(swin_v2_module.py:271, 349-350, 494-495) plus real unit coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_neuroimage_tpu.nn import swin2d
from multimodal_neuroimage_tpu.nn.common import window_partition, window_reverse


def test_window_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 5)).astype(np.float32))
    w = window_partition(x, 6)
    assert w.shape == (2, 4, 36, 5)
    back = window_reverse(w, 6, 12, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_structure():
    mask = swin2d.shift_attn_mask(12, 12, 6, 3)
    assert mask.shape == (4, 36, 36)
    # the first (unshifted interior) window mixes freely
    assert np.all(mask[0] == 0)
    # the last (corner) window must block cross-region attention
    assert (mask[-1] == -100).sum() > 0
    assert swin2d.shift_attn_mask(12, 12, 6, 0) is None


def test_relative_position_index_bounds():
    idx = swin2d.relative_position_index(6, 6)
    assert idx.shape == (36, 36)
    assert idx.min() >= 0 and idx.max() < 11 * 11
    # self-relative position is the table center for every token
    assert len(np.unique(np.diag(idx))) == 1


def test_swin_classifier_shapes(rng):
    model = swin2d.SwinTransformerV2(depths=(2, 2), num_heads=(3, 6))
    x = jnp.asarray(rng.normal(size=(2, 84, 84)).astype(np.float32))
    vars_ = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = model.apply(vars_, x, deterministic=True)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("size,expected", [
    ("small", ((2,), (3,))), ("medium", ((2, 2), (3, 6))),
    ("large", ((2, 2, 6), (3, 6, 12)))])
def test_size_presets(size, expected):
    assert swin2d.size_preset(size) == expected


def test_res_post_norm_zero_init_is_identity_at_init(rng):
    """With zero-init res-post-norms (swin_v2_module.py:446-451) each block is
    the identity at initialisation."""
    block = swin2d.SwinBlockV2(dim=12, input_resolution=(12, 12), num_heads=3,
                               window_size=6)
    x = jnp.asarray(rng.normal(size=(2, 144, 12)).astype(np.float32))
    vars_ = block.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = block.apply(vars_, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_window_attention_matches_naive(rng):
    """Batched-window einsum path == per-window naive attention."""
    attn = swin2d.WindowAttentionV2(dim=12, window_size=(6, 6), num_heads=3)
    x = jnp.asarray(rng.normal(size=(1, 4, 36, 12)).astype(np.float32))
    vars_ = attn.init(jax.random.PRNGKey(0), x, None, True)
    full = attn.apply(vars_, x, None, True)
    # run each window separately through the same params
    for w in range(4):
        single = attn.apply(vars_, x[:, w:w + 1], None, True)
        np.testing.assert_allclose(np.asarray(single[:, 0]),
                                   np.asarray(full[:, w]), atol=1e-5)


def test_window_perm_indices_match_glue_chain():
    """Permutation-glue planes (nn/common.py window_perm_indices) must
    reproduce the roll/partition/pad entry chain on valid rows and invert it
    exactly on exit, for both shift parities."""
    import jax.numpy as jnp
    import numpy as np
    from multimodal_neuroimage_tpu.nn import common as cm

    H = W = 12
    ws, N, NP = 6, 36, 40
    x = np.random.default_rng(0).normal(size=(2, H, W, 4)).astype(np.float32)
    for shift in (0, 3):
        xi = jnp.asarray(x)
        if shift:
            xi = jnp.roll(xi, (-shift, -shift), axis=(1, 2))
        ref = cm.window_partition(xi, ws)
        entry, exit_ = cm.window_perm_indices(H, W, ws, shift, NP)
        got = jnp.take(jnp.asarray(x.reshape(2, H * W, 4)),
                       jnp.asarray(entry), axis=1).reshape(2, -1, NP, 4)
        np.testing.assert_array_equal(np.asarray(got[:, :, :N]),
                                      np.asarray(ref))
        back = jnp.take(got.reshape(2, -1, 4), jnp.asarray(exit_), axis=1)
        np.testing.assert_array_equal(np.asarray(back), x.reshape(2, H * W, 4))
