"""Import HuggingFace BertModel weights into the JAX BertEncoder param tree.

Serves two purposes:
 1. golden-parity testing against ``transformers.BertModel`` — the exact stack
    the reference uses (reference model.py:4, 159);
 2. migrating reference ``.pth`` checkpoints into this framework.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def bert_params_from_hf(state: Mapping[str, Any], num_layers: int,
                        prefix: str = "",
                        scan_layers: bool = True) -> Dict[str, Any]:
    """Map a ``transformers.BertModel`` state_dict to BertEncoder params.

    ``prefix`` selects a submodule inside a larger state_dict (e.g.
    ``transformer_low.bert.`` when importing a reference Transformer_Block).
    With ``scan_layers`` (the encoder default) the per-layer trees are stacked
    along a leading depth axis under ``layers/layer``.
    """
    def g(name):
        return _t(state[prefix + name])

    def dense(name):
        return {"kernel": g(f"{name}.weight").T, "bias": g(f"{name}.bias")}

    def ln(name):
        return {"scale": g(f"{name}.weight"), "bias": g(f"{name}.bias")}

    params: Dict[str, Any] = {
        "position_embeddings": g("embeddings.position_embeddings.weight"),
        # HF type_vocab_size defaults to 2; with inputs_embeds only type 0 is used
        "token_type_embeddings": g("embeddings.token_type_embeddings.weight")[0:1],
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "pooler_dense": dense("pooler.dense"),
    }

    def row(x):
        return x.reshape(1, -1)

    def layer_tree(i):
        # flat per-layer params (nn/bert.py BertLayer owns them directly so
        # the whole layer can run as one Pallas megakernel)
        base = f"encoder.layer.{i}"
        return {
            "query_kernel": g(f"{base}.attention.self.query.weight").T,
            "query_bias": row(g(f"{base}.attention.self.query.bias")),
            "key_kernel": g(f"{base}.attention.self.key.weight").T,
            "key_bias": row(g(f"{base}.attention.self.key.bias")),
            "value_kernel": g(f"{base}.attention.self.value.weight").T,
            "value_bias": row(g(f"{base}.attention.self.value.bias")),
            "attn_output_kernel": g(f"{base}.attention.output.dense.weight").T,
            "attn_output_bias": row(g(f"{base}.attention.output.dense.bias")),
            "attn_ln_scale": row(g(f"{base}.attention.output.LayerNorm.weight")),
            "attn_ln_bias": row(g(f"{base}.attention.output.LayerNorm.bias")),
            "intermediate_kernel": g(f"{base}.intermediate.dense.weight").T,
            "intermediate_bias": row(g(f"{base}.intermediate.dense.bias")),
            "output_kernel": g(f"{base}.output.dense.weight").T,
            "output_bias": row(g(f"{base}.output.dense.bias")),
            "output_ln_scale": row(g(f"{base}.output.LayerNorm.weight")),
            "output_ln_bias": row(g(f"{base}.output.LayerNorm.bias")),
        }

    if scan_layers:
        import jax
        trees = [layer_tree(i) for i in range(num_layers)]
        params["layers"] = {"layer": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *trees)}
    else:
        for i in range(num_layers):
            params[f"layer_{i}"] = layer_tree(i)
    return params
