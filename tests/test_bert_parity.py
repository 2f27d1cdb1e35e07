"""Golden parity: our BertEncoder vs transformers.BertModel.

The reference's fMRI encoder IS HuggingFace BertModel fed with inputs_embeds
(reference model.py:154-192); fp32 logit parity with that stack is the
north-star numerical contract (BASELINE.md)."""

import numpy as np
import pytest

from multimodal_neuroimage_tpu.nn.bert import BertEncoder, TemporalBert
from multimodal_neuroimage_tpu.utils.hf_import import bert_params_from_hf

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


HIDDEN, LAYERS, HEADS, SEQ = 84, 4, 12, 47


def _hf_model():
    cfg = transformers.BertConfig(
        hidden_size=HIDDEN, vocab_size=1, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, max_position_embeddings=SEQ + 1,
        hidden_dropout_prob=0.1,
    )  # mirrors reference model.py:59-67
    model = transformers.BertModel(cfg, add_pooling_layer=True)
    model.eval()
    return model


def test_bert_encoder_matches_hf(rng):
    import jax

    model = _hf_model()
    x = rng.normal(size=(2, SEQ + 1, HIDDEN)).astype(np.float32)

    with torch.no_grad():
        out = model(inputs_embeds=torch.from_numpy(x))
    ref_seq = out[0].numpy()
    ref_pooled = out[1].numpy()

    enc = BertEncoder(hidden=HIDDEN, layers=LAYERS, heads=HEADS,
                      max_positions=SEQ + 1)
    params = bert_params_from_hf(model.state_dict(), LAYERS)
    # full-f32 matmuls for the parity check; the production precision policy
    # (bf16 on MXU) is a deliberate, separately-validated choice
    with jax.default_matmul_precision("highest"):
        seq, pooled = enc.apply({"params": params}, x, deterministic=True)

    np.testing.assert_allclose(np.asarray(seq), ref_seq, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-4)


def test_temporal_bert_output_contract(rng):
    import jax

    m = TemporalBert(hidden=HIDDEN, layers=2, heads=12, max_positions=SEQ + 1)
    x = rng.normal(size=(3, SEQ, HIDDEN)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = m.apply(variables, x, deterministic=True)
    assert out["sequence"].shape == (3, SEQ, HIDDEN)
    assert out["cls"].shape == (3, HIDDEN)
