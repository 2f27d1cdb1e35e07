"""Golden activation parity vs the REFERENCE torch Swin modules.

The reference modules (swin_v2_module.py, swinfusion_module.py) import only
DropPath / to_2tuple / trunc_normal_ from timm (swin_v2_module.py:12); timm
is absent from this image, so a minimal stub is injected and the reference
files themselves run under torch (CPU) as the oracle — the same role
transformers.BertModel plays in test_bert_parity.py.

Covered (VERDICT round-1 item 6):
  * WindowAttention — scaled-cosine attention + cpb-MLP bias
    (swin_v2_module.py:87-178) vs nn/swin2d.py WindowAttentionV2
  * full SwinTransformerBlock — res-post-norm, cyclic shift + mask
    (swin_v2_module.py:198-304) vs SwinBlockV2
  * Cross_WindowAttention — q from x, k/v from y
    (swinfusion_module.py:163-262) vs the CrossFusionBlock attention math
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/modules"


# ---------------------------------------------------------------------------
# timm stub + reference module loader
# ---------------------------------------------------------------------------

def _install_timm_stub():
    if "timm.models.layers" in sys.modules:
        return
    import torch.nn as tnn

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):   # parity runs in eval mode -> identity
            return x

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath, layers.to_2tuple, layers.trunc_normal_ = (
        DropPath, to_2tuple, trunc_normal_)
    timm.models, models.layers = models, layers
    sys.modules.update({"timm": timm, "timm.models": models,
                        "timm.models.layers": layers})

    # reference CUDA-ism: swin_v2_module.py:154 does
    # .to(self.logit_scale.get_device()), and get_device() is -1 on CPU
    orig = torch.Tensor.get_device

    def _get_device(self):
        d = orig(self)
        return "cpu" if d == -1 else d

    torch.Tensor.get_device = _get_device


def _load_ref(name):
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def swin_v2():
    return _load_ref("swin_v2_module")


@pytest.fixture(scope="module")
def swinfusion():
    return _load_ref("swinfusion_module")


def _t2n(t):
    return t.detach().cpu().numpy()


DIM, WS, HEADS = 12, 6, 6
N = WS * WS
RES = 12                     # token grid 12x12 -> 4 windows
NW = (RES // WS) ** 2


# ---------------------------------------------------------------------------
# WindowAttention (cosine + cpb) parity
# ---------------------------------------------------------------------------

def _window_attention_params(ref):
    """torch module -> flax param tree for WindowAttentionV2."""
    sd = {k: _t2n(v) for k, v in ref.state_dict().items()}
    return {
        "qkv_kernel": sd["qkv.weight"].T,
        "q_bias": sd["q_bias"],
        "v_bias": sd["v_bias"],
        "logit_scale": sd["logit_scale"],
        "cpb_fc1": {"kernel": sd["cpb_mlp.0.weight"].T,
                    "bias": sd["cpb_mlp.0.bias"]},
        "cpb_fc2": {"kernel": sd["cpb_mlp.2.weight"].T},
        "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
    }


def test_window_attention_cosine_cpb_parity(swin_v2):
    from multimodal_neuroimage_tpu.nn.swin2d import WindowAttentionV2
    torch.manual_seed(0)
    ref = swin_v2.WindowAttention(DIM, (WS, WS), num_heads_swin=HEADS,
                                  qkv_bias=True).eval()
    # non-trivial weights (ctor zero-inits biases/table inputs)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    x = torch.randn(2 * NW, N, DIM)              # (B_*nW, N, C)
    want = _t2n(ref(x, mask=None))

    ours = WindowAttentionV2(DIM, (WS, WS), HEADS)
    params = jax.tree_util.tree_map(jnp.asarray,
                                    _window_attention_params(ref))
    xj = jnp.asarray(_t2n(x)).reshape(2, NW, N, DIM)
    got = ours.apply({"params": params}, xj, None, True)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape), want,
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Full SwinTransformerBlock (res-post-norm) parity, shift and no-shift
# ---------------------------------------------------------------------------

def _swin_block_params(ref):
    sd = {k: _t2n(v) for k, v in ref.state_dict().items()}
    return {
        "attn": {
            "qkv_kernel": sd["attn.qkv.weight"].T,
            "q_bias": sd["attn.q_bias"],
            "v_bias": sd["attn.v_bias"],
            "logit_scale": sd["attn.logit_scale"],
            "cpb_fc1": {"kernel": sd["attn.cpb_mlp.0.weight"].T,
                        "bias": sd["attn.cpb_mlp.0.bias"]},
            "cpb_fc2": {"kernel": sd["attn.cpb_mlp.2.weight"].T},
            "proj": {"kernel": sd["attn.proj.weight"].T,
                     "bias": sd["attn.proj.bias"]},
        },
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "mlp": {"Dense_0": {"kernel": sd["mlp.fc1.weight"].T,
                            "bias": sd["mlp.fc1.bias"]},
                "Dense_1": {"kernel": sd["mlp.fc2.weight"].T,
                            "bias": sd["mlp.fc2.bias"]}},
    }


@pytest.mark.parametrize("shift", [0, WS // 2])
def test_swin_block_res_post_norm_parity(swin_v2, shift):
    from multimodal_neuroimage_tpu.nn.swin2d import SwinBlockV2
    torch.manual_seed(1 + shift)
    ref = swin_v2.SwinTransformerBlock(
        DIM, (RES, RES), num_heads_swin=HEADS, window_size=WS,
        shift_size=shift).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    x = torch.randn(2, RES * RES, DIM)
    want = _t2n(ref(x))

    ours = SwinBlockV2(DIM, (RES, RES), HEADS, window_size=WS,
                       shift_size=shift)
    params = jax.tree_util.tree_map(jnp.asarray, _swin_block_params(ref))
    got = ours.apply({"params": params}, jnp.asarray(_t2n(x)), True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# Cross_WindowAttention (q from x, k/v from y) parity
# ---------------------------------------------------------------------------

def test_cross_window_attention_parity(swinfusion):
    """Oracle: swinfusion_module.Cross_WindowAttention. Ours: the same math
    as used by CrossFusionBlock — q/kv projections + _plain_window_attention
    + output proj over the flat param layout."""
    from multimodal_neuroimage_tpu.nn.swin2d import relative_position_index
    from multimodal_neuroimage_tpu.nn.swinfusion import \
        _plain_window_attention
    torch.manual_seed(3)
    ref = swinfusion.Cross_WindowAttention(DIM, (WS, WS), HEADS,
                                           qkv_bias=True).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    x = torch.randn(2 * NW, N, DIM)
    y = torch.randn(2 * NW, N, DIM)
    want = _t2n(ref(x, y, mask=None))

    sd = {k: _t2n(v) for k, v in ref.state_dict().items()}
    xj = jnp.asarray(_t2n(x)).reshape(2, NW, N, DIM)
    yj = jnp.asarray(_t2n(y)).reshape(2, NW, N, DIM)
    q = xj @ sd["q.weight"].T + sd["q.bias"]
    kv = yj @ sd["kv.weight"].T + sd["kv.bias"]
    o = _plain_window_attention(
        q, kv, jnp.asarray(sd["relative_position_bias_table"]),
        relative_position_index(WS, WS), None, HEADS,
        lambda t: t, jnp.float32)
    got = o @ sd["proj.weight"].T + sd["proj.bias"]
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape), want,
                               rtol=2e-4, atol=2e-5)
