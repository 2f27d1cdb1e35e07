"""Golden activation parity vs the REFERENCE torch crossmodal (MulT) stack.

The reference's fairseq-derived modules (crossmodal_transformer.py,
multihead_attention.py, position_embedding.py) are pure torch with no
external deps, so they run directly as the oracle — the same role
transformers.BertModel plays in test_bert_parity.py and the timm-stubbed
Swin modules play in test_swin_golden.py. These modules power
``Transformer_Net_Cross_Attention`` (reference model.py:341-552), the step-2
lowfreqBERT family.

Covered:
  * SinusoidalPositionalEmbedding — position numbering from padding_idx+1,
    channel-0 pad probe zeroing (position_embedding.py:8-27, 58-59)
  * self-attention TransformerEncoder stack — embed scale, shared q/k/v
    LayerNorm, pre-LN residuals, fp32 softmax, final LN
    (crossmodal_transformer.py:9-96)
  * crossmodal (q from x, k/v from y) stack with different source length
  * future mask offset by 1+|src-tgt| (crossmodal_transformer.py:179-186)
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from multimodal_neuroimage_tpu.nn.crossmodal import (  # noqa: E402
    MultTransformerEncoder, positional_embedding)

REF_ROOT = "/root/reference"   # `modules.*` resolves as a namespace package

E, H, L = 48, 4, 2
ATOL = 3e-5


def _load_ref_encoder(attn_mask: bool):
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from modules.crossmodal_transformer import TransformerEncoder
    torch.manual_seed(55555555)
    enc = TransformerEncoder(E, H, L, attn_dropout=0.1, relu_dropout=0.1,
                             res_dropout=0.1, embed_dropout=0.25,
                             attn_mask=attn_mask)
    enc.eval()
    return enc


def _flax_params(enc):
    """torch state_dict -> MultTransformerEncoder tree (package mapper)."""
    from multimodal_neuroimage_tpu.utils.torch_import import mult_encoder_tree
    return jax.tree_util.tree_map(
        jnp.asarray, mult_encoder_tree(enc.state_dict(), "", L))


import jax  # noqa: E402


def _inputs(t, b=2, pad_tail=4, seed=3):
    """(B, T, E) with a zero-padded tail to exercise the channel-0 pad probe."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, t, E)).astype(np.float32)
    if pad_tail:
        x[:, t - pad_tail:, :] = 0.0
    return x


def _torch_out(enc, x, x_k=None):
    """Reference layout is (T, B, E)."""
    tt = lambda a: torch.from_numpy(np.transpose(a, (1, 0, 2)))
    with torch.no_grad():
        if x_k is None:
            out = enc(tt(x))
        else:
            out = enc(tt(x), tt(x_k), tt(x_k))
    return np.transpose(out.numpy(), (1, 0, 2))


def test_sinusoidal_positional_embedding_parity():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from modules.position_embedding import SinusoidalPositionalEmbedding
    x = _inputs(t=17, pad_tail=5)
    ref = SinusoidalPositionalEmbedding(E)
    with torch.no_grad():
        # reference probes channel 0 of the (B, T) slice for padding
        got_ref = ref(torch.from_numpy(x[:, :, 0])).numpy()
    got = np.asarray(positional_embedding(jnp.asarray(x)))
    np.testing.assert_allclose(got, got_ref, atol=1e-6)


@pytest.mark.parametrize("attn_mask", [False, True])
def test_self_attention_stack_parity(attn_mask):
    enc = _load_ref_encoder(attn_mask)
    x = _inputs(t=21)
    want = _torch_out(enc, x)
    model = MultTransformerEncoder(E, H, L, attn_mask=attn_mask)
    got = np.asarray(model.apply({"params": _flax_params(enc)},
                                 jnp.asarray(x), deterministic=True))
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("attn_mask", [False, True])
def test_crossmodal_stack_parity(attn_mask):
    """q from x (Tq), k/v from y (Tk != Tq) — the MulT cross direction, incl.
    the 1+|src-tgt| future-mask offset when attn_mask is on."""
    enc = _load_ref_encoder(attn_mask)
    x = _inputs(t=15, pad_tail=0, seed=5)
    y = _inputs(t=24, pad_tail=6, seed=7)
    want = _torch_out(enc, x, y)
    model = MultTransformerEncoder(E, H, L, attn_mask=attn_mask)
    got = np.asarray(model.apply({"params": _flax_params(enc)},
                                 jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(y), deterministic=True))
    np.testing.assert_allclose(got, want, atol=ATOL)
