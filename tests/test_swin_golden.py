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
  * FULL SwinTransformerV2 encoder+head — the reference model.py:557-728
    class itself as oracle, weights migrated via
    utils/torch_import.swin_encoder_tree
  * full SwinTransformerBlock_fusion / Cross_SwinTransformerBlock
    (swinfusion_module.py:265-558) vs FusionBlock / CrossFusionBlock via
    utils/torch_import.{fusion_block_tree, cross_fusion_block_tree}
  * the MLP VAE (model.py:602-718 encoder/decoder) via
    utils/torch_import.vae_tree

The torch->flax weight mappers under test live in
multimodal_neuroimage_tpu/utils/torch_import.py — the reference-user
migration path; these tests are what verifies that mapping.
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
    for m in (timm, models, layers):
        # transformers probes importlib.util.find_spec("timm"), which raises
        # ValueError on an in-sys.modules module whose __spec__ is None
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
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
    """torch module -> flax param tree (utils/torch_import mapper)."""
    from multimodal_neuroimage_tpu.utils.torch_import import \
        swin_attention_tree
    return swin_attention_tree(ref.state_dict())


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
    from multimodal_neuroimage_tpu.utils.torch_import import swin_block_tree
    return swin_block_tree(ref.state_dict())


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


# ---------------------------------------------------------------------------
# FULL SwinTransformerV2 (reference model.py:557-728) via swin_encoder_tree
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_model():
    """Load the reference's model.py itself (timm stub + sys.path)."""
    import sys
    _install_timm_stub()
    # the BERT-family forwards call torch.cuda.nvtx.range_push/pop
    # (model.py:221 etc.) — no-op them on the CPU build
    torch.cuda.nvtx.range_push = lambda *_a, **_k: None
    torch.cuda.nvtx.range_pop = lambda *_a, **_k: None
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location("ref_model",
                                                  "/root/reference/model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _perturb(ref, std=0.05, seed=7):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * std)


def test_full_swin_encoder_head_parity(ref_model):
    """Reference SwinTransformerV2_VAE's swin encoder+head (model.py:557-728,
    forward_features at 695-707) vs nn/swin2d.SwinTransformerV2 with weights
    migrated by utils/torch_import.swin_encoder_tree."""
    from multimodal_neuroimage_tpu.nn.swin2d import SwinTransformerV2
    from multimodal_neuroimage_tpu.utils.torch_import import \
        swin_encoder_tree
    depths, heads = (2, 2), (3, 6)
    ref = ref_model.SwinTransformerV2_VAE(
        img_size_w=84, img_size_h=84, patch_size=7, embed_dim=DIM,
        depths=list(depths), num_heads_swin=list(heads), window_size=WS,
        drop_path_rate=0.0, fine_tune_task="binary_classification",
        drop_rate=0.0, attn_drop_rate=0.0, use_vae=False).eval()
    _perturb(ref)

    x = torch.randn(2, 84, 84)
    with torch.no_grad():
        feats = ref.forward_features(x.unsqueeze(1))
        want = _t2n(ref.head(feats))

    ours = SwinTransformerV2(img_size=(84, 84), patch_size=7, embed_dim=DIM,
                             depths=depths, num_heads=heads, window_size=WS,
                             drop_path_rate=0.0, num_classes=1)
    params = jax.tree_util.tree_map(
        jnp.asarray, swin_encoder_tree(ref.state_dict(), depths))
    got = ours.apply({"params": params}, jnp.asarray(_t2n(x))[..., None],
                     True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-4)


def test_vae_import_parity(ref_model):
    """Reference MLP-VAE encoder/decoder (model.py:663-676) vs MlpVae with
    utils/torch_import.vae_tree, deterministic (z = mu)."""
    from multimodal_neuroimage_tpu.models.struct_nets import MlpVae
    from multimodal_neuroimage_tpu.utils.torch_import import vae_tree
    ref = ref_model.SwinTransformerV2_VAE(
        img_size_w=84, img_size_h=84, patch_size=7, embed_dim=DIM,
        depths=[2], num_heads_swin=[3], window_size=WS,
        fine_tune_task="binary_classification", drop_rate=0.0,
        attn_drop_rate=0.0, use_vae=True).eval()
    _perturb(ref, seed=11)

    x = torch.randn(3, 84, 84)
    with torch.no_grad():
        mu, _logvar = ref.encoder(x.reshape(3, -1))
        want = _t2n(ref.decoder(mu)).reshape(3, 84, 84)

    params = jax.tree_util.tree_map(jnp.asarray, vae_tree(ref.state_dict()))
    recon, mu_j, _ = MlpVae().apply({"params": params},
                                    jnp.asarray(_t2n(x)), True)
    np.testing.assert_allclose(np.asarray(mu_j), _t2n(mu), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(recon), want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# full fusion blocks (swinfusion_module.py:265-558) via fusion_block_tree
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shift", [0, WS // 2])
def test_fusion_block_full_parity(swinfusion, shift):
    from multimodal_neuroimage_tpu.nn.swinfusion import FusionBlock
    from multimodal_neuroimage_tpu.utils.torch_import import \
        fusion_block_tree
    torch.manual_seed(21 + shift)
    ref = swinfusion.SwinTransformerBlock_fusion(
        dim=DIM, input_resolution=(RES, RES), num_heads=HEADS,
        window_size=WS, shift_size=shift).eval()
    _perturb(ref)

    x = torch.randn(2, RES * RES, DIM)
    with torch.no_grad():
        want = _t2n(ref(x, (RES, RES)))

    ours = FusionBlock(DIM, (RES, RES), HEADS, window_size=WS,
                       shift_size=shift)
    params = jax.tree_util.tree_map(jnp.asarray,
                                    fusion_block_tree(ref.state_dict()))
    got = ours.apply({"params": params}, jnp.asarray(_t2n(x)), True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=5e-5)


@pytest.mark.parametrize("shift", [0, WS // 2])
def test_cross_fusion_block_full_parity(swinfusion, shift):
    from multimodal_neuroimage_tpu.nn.swinfusion import CrossFusionBlock
    from multimodal_neuroimage_tpu.utils.torch_import import \
        cross_fusion_block_tree
    torch.manual_seed(31 + shift)
    ref = swinfusion.Cross_SwinTransformerBlock(
        dim=DIM, input_resolution=(RES, RES), num_heads=HEADS,
        window_size=WS, shift_size=shift).eval()
    _perturb(ref)

    x = torch.randn(2, RES * RES, DIM)
    y = torch.randn(2, RES * RES, DIM)
    with torch.no_grad():
        want_x, want_y = ref(x, y, (RES, RES))

    ours = CrossFusionBlock(DIM, (RES, RES), HEADS, window_size=WS,
                            shift_size=shift)
    params = jax.tree_util.tree_map(
        jnp.asarray, cross_fusion_block_tree(ref.state_dict()))
    got_x, got_y = ours.apply({"params": params}, jnp.asarray(_t2n(x)),
                              jnp.asarray(_t2n(y)), True)
    np.testing.assert_allclose(np.asarray(got_x), _t2n(want_x), rtol=2e-4,
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_y), _t2n(want_y), rtol=2e-4,
                               atol=5e-5)


# ---------------------------------------------------------------------------
# FULL SwinFusion network (reference model.py:1131-1555) — the flagship's
# fusion path end-to-end: conv stems -> Ex RSTBs -> CRSTB cross-fusion ->
# Re RSTBs -> conv collapse -> SwinV2 classifier, via swinfusion_net_tree
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_full_swinfusion_net_parity(ref_model):
    from multimodal_neuroimage_tpu.models.swinfusion_net import SwinFusionNet
    from multimodal_neuroimage_tpu.utils.torch_import import \
        swinfusion_net_tree
    torch.manual_seed(41)
    ex_d, fu_d, re_d = (2,), (2,), (2,)
    ref = ref_model.SwinFusion(
        img_size=84, patch_size=7, in_chans=1, embed_dim=DIM,
        Ex_depths=list(ex_d), Fusion_depths=list(fu_d),
        Re_depths=list(re_d), Ex_num_heads=[6], Fusion_num_heads=[6],
        Re_num_heads=[6], window_size=WS, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0,
        # kwargs consumed by the inner plain SwinTransformerV2
        # (model.py:995-1032): size_of_model default -> large [2,2,6]
        fine_tune_task="binary_classification", intermediate_vec=84,
        swin_embed_dim=12, no_init_weights=False).eval()
    _perturb(ref, std=0.02, seed=41)

    a = torch.randn(2, 84, 84) * 0.5
    b = torch.randn(2, 84, 84) * 0.5
    with torch.no_grad():
        want = _t2n(ref(a, b)["binary_classification"])

    ours = SwinFusionNet(embed_dim=DIM, ex_depths=ex_d, fusion_depths=fu_d,
                         re_depths=re_d, ex_heads=(6,), fusion_heads=(6,),
                         re_heads=(6,), window_size=WS, drop_rate=0.0,
                         attn_drop_rate=0.0, drop_path_rate=0.0)
    params = jax.tree_util.tree_map(
        jnp.asarray, swinfusion_net_tree(ref.state_dict(), ex_d, fu_d, re_d))
    out = ours.apply({"params": params},
                     {"smri": jnp.asarray(_t2n(a)),
                      "dti": jnp.asarray(_t2n(b))}, True)
    got = np.asarray(out["binary_classification"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# FULL Transformer_Net_Cross_Attention (reference model.py:341-552): the
# step-2 MulT model — shared-proj_l quirk, bidirectional crossmodal
# encoders, concat memory, last-step readout + head
# ---------------------------------------------------------------------------

def test_full_transformer_net_cross_attention_parity(ref_model):
    from multimodal_neuroimage_tpu.models.fmri_nets import \
        TransformerNetCrossAttention
    from multimodal_neuroimage_tpu.utils.torch_import import \
        transformer_net_cross_attention_tree
    torch.manual_seed(61)
    T, IV, NL = 32, 84, 2
    ref = ref_model.Transformer_Net_Cross_Attention(
        fine_tune_task="binary_classification", intermediate_vec=IV,
        num_heads_mult=12, nlevels=NL, attn_dropout=0.0, attn_dropout_u=0.0,
        relu_dropout=0.0, res_dropout=0.0, out_dropout=0.0,
        embed_dropout=0.0, attn_mask=True, sequence_length=T,
        feature_map_gen="convolution_ul+l", feature_map_size="same",
        mixing="U2L_and_L2U", concat_method="concat",
        fmri_type="divided_frequency", dataset_name="multimodal",
        transformer_hidden_layers=NL, transformer_dropout_rate=0.0).eval()
    _perturb(ref, std=0.02, seed=61)

    x_l = torch.randn(2, T, IV) * 0.5
    x_u = torch.randn(2, T, IV) * 0.5
    with torch.no_grad():
        want = _t2n(ref(x_l, x_u)["binary_classification"])

    ours = TransformerNetCrossAttention(
        intermediate_vec=IV, num_heads_mult=12, nlevels=NL,
        sequence_length=T, attn_dropout=0.0, attn_dropout_u=0.0,
        relu_dropout=0.0, res_dropout=0.0, embed_dropout=0.0,
        attn_mask=True, feature_map_size="same",
        feature_map_gen="convolution_ul+l", mixing="U2L_and_L2U",
        concat_method="concat", fmri_type="divided_frequency")
    params = jax.tree_util.tree_map(
        jnp.asarray, transformer_net_cross_attention_tree(
            ref.state_dict(), NL))
    out = ours.apply({"params": params},
                     {"fmri_lowfreq_sequence": jnp.asarray(_t2n(x_l)),
                      "fmri_ultralowfreq_sequence": jnp.asarray(_t2n(x_u))},
                     True)
    got = np.asarray(out["binary_classification"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Transformer_Net (model.py:194-239) and Transformer_Net_Two_Channels
# (model.py:241-339): the step-1/step-2 BERT family, full-model
# ---------------------------------------------------------------------------

_BERT_KW = dict(fine_tune_task="binary_classification",
                transformer_dropout_rate=0.0, num_heads_2DBert=12,
                num_heads_mult=12, concat_method="concat",
                feature_map_size="same", feature_map_gen="no",
                use_merge_loss=False, feature_squeeze=False)


def test_full_transformer_net_parity(ref_model):
    from multimodal_neuroimage_tpu.models.fmri_nets import TransformerNet
    from multimodal_neuroimage_tpu.utils.torch_import import \
        transformer_net_tree
    torch.manual_seed(71)
    T, IV, L = 32, 84, 2
    ref = ref_model.Transformer_Net(
        dataset_name="fMRI_timeseries", fmri_type="timeseries",
        sequence_length=T, intermediate_vec=IV,
        transformer_hidden_layers=L, **_BERT_KW).eval()
    _perturb(ref, std=0.02, seed=71)

    x = torch.randn(2, T, IV) * 0.5
    with torch.no_grad():
        want = ref(x)
    ours = TransformerNet(intermediate_vec=IV, transformer_hidden_layers=L,
                          num_heads_2DBert=12, sequence_length=T,
                          transformer_dropout_rate=0.0)
    params = jax.tree_util.tree_map(
        jnp.asarray, transformer_net_tree(ref.state_dict(), L))
    out = ours.apply({"params": params},
                     {"fmri_sequence": jnp.asarray(_t2n(x))}, True)
    np.testing.assert_allclose(np.asarray(out["binary_classification"]),
                               _t2n(want["binary_classification"]),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["reconstructed_fmri_sequence"]),
        _t2n(want["reconstructed_fmri_sequence"]), rtol=5e-4, atol=5e-4)


def test_full_two_channels_parity(ref_model):
    from multimodal_neuroimage_tpu.models.fmri_nets import \
        TransformerNetTwoChannels
    from multimodal_neuroimage_tpu.utils.torch_import import \
        transformer_net_two_channels_tree
    torch.manual_seed(72)
    T, IV, L = 32, 84, 2
    ref = ref_model.Transformer_Net_Two_Channels(
        dataset_name="multimodal", fmri_type="divided_frequency",
        sequence_length=T, intermediate_vec=IV,
        transformer_hidden_layers=L, **_BERT_KW).eval()
    _perturb(ref, std=0.02, seed=72)

    x_l = torch.randn(2, T, IV) * 0.5
    x_u = torch.randn(2, T, IV) * 0.5
    with torch.no_grad():
        want = _t2n(ref(None, x_l, x_u)["binary_classification"])
    ours = TransformerNetTwoChannels(
        intermediate_vec=IV, transformer_hidden_layers=L,
        num_heads_2DBert=12, sequence_length=T,
        transformer_dropout_rate=0.0, concat_method="concat",
        feature_map_size="same")
    params = jax.tree_util.tree_map(
        jnp.asarray, transformer_net_two_channels_tree(ref.state_dict(), L))
    out = ours.apply({"params": params},
                     {"fmri_lowfreq_sequence": jnp.asarray(_t2n(x_l)),
                      "fmri_ultralowfreq_sequence": jnp.asarray(_t2n(x_u))},
                     True)
    np.testing.assert_allclose(np.asarray(out["binary_classification"]),
                               want, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("variant", ["add", "transfer"])
def test_full_funcstruct_add_transfer_parity(ref_model, variant):
    from multimodal_neuroimage_tpu.models.func_struct import (FuncStructAdd,
                                                              FuncStructTransfer)
    from multimodal_neuroimage_tpu.utils.torch_import import \
        funcstruct_add_tree
    torch.manual_seed(73)
    T, IV, L = 32, 84, 2
    cls = (ref_model.Func_Struct_Add if variant == "add"
           else ref_model.Func_Struct_Transfer)
    ref = cls(img_size_w=IV, img_size_h=IV, patch_size=7, embed_dim=DIM,
              depths=[2], num_heads_swin=[3], window_size=WS,
              drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
              dataset_name="multimodal", fmri_type="divided_frequency",
              sequence_length=T, intermediate_vec=IV,
              transformer_hidden_layers=L, **_BERT_KW).eval()
    _perturb(ref, std=0.02, seed=73)

    x_l = torch.randn(2, T, IV) * 0.5
    x_u = torch.randn(2, T, IV) * 0.5
    struct = torch.randn(2, IV, IV) * 0.5
    with torch.no_grad():
        want = _t2n((ref(x_l, x_u, struct) if variant == "add"
                     else ref(x_l, x_u))["binary_classification"])

    our_cls = FuncStructAdd if variant == "add" else FuncStructTransfer
    ours = our_cls(intermediate_vec=IV, transformer_hidden_layers=L,
                   num_heads_2DBert=12, sequence_length=T,
                   transformer_dropout_rate=0.0, concat_method="concat",
                   feature_map_size="same", use_FC=False,
                   fusion_drop=0.0, fusion_drop_path=0.0, window_size=WS,
                   size_of_model="small", swin_embed_dim=DIM, patch_size=7)
    params = jax.tree_util.tree_map(
        jnp.asarray, funcstruct_add_tree(ref.state_dict(), L, (2,)))
    batch = {"fmri_lowfreq_sequence": jnp.asarray(_t2n(x_l)),
             "fmri_ultralowfreq_sequence": jnp.asarray(_t2n(x_u)),
             "struct": jnp.asarray(_t2n(struct))}
    out = ours.apply({"params": params}, batch, True)
    np.testing.assert_allclose(np.asarray(out["binary_classification"]),
                               want, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# FULL SwinTransformerV2_UNet (model.py:802-967): UNet denoiser -> SwinV2.
# The torch model runs in TRAIN mode with all dropout rates 0 so BatchNorm
# normalizes by batch statistics — matching our BatchStatNorm semantics
# (running-average eval stats are intentionally not carried, nn/unet.py).
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_full_swin_unet_classifier_parity(ref_model):
    from multimodal_neuroimage_tpu.models.struct_nets import \
        SwinClassifierUNet
    from multimodal_neuroimage_tpu.utils.torch_import import \
        swin_unet_classifier_tree
    torch.manual_seed(81)
    ref = ref_model.SwinTransformerV2_UNet(
        img_size_w=84, img_size_h=84, patch_size=7, embed_dim=DIM,
        depths=[2], num_heads_swin=[3], window_size=WS,
        drop_path_rate=0.0, fine_tune_task="binary_classification",
        drop_rate=0.0, attn_drop_rate=0.0).train()
    _perturb(ref, std=0.02, seed=81)

    x = torch.randn(3, 84, 84) * 0.5
    with torch.no_grad():
        want = _t2n(ref(x)["binary_classification"])

    ours = SwinClassifierUNet(size_of_model="small", patch_size=7,
                              swin_embed_dim=DIM, window_size=WS,
                              drop_rate=0.0, attn_drop_rate=0.0,
                              drop_path_rate=0.0, dataset_name="sMRI")
    params = jax.tree_util.tree_map(
        jnp.asarray, swin_unet_classifier_tree(ref.state_dict(), (2,)))
    out = ours.apply({"params": params},
                     {"smri": jnp.asarray(_t2n(x))}, True)
    np.testing.assert_allclose(np.asarray(out["binary_classification"]),
                               want, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# FLAGSHIP Func_Struct_Cross (reference model.py:1558-2020): dual temporal
# BERTs -> CLS concat + proj -> diag + FC embedding -> SwinFusion backbone
# with struct -> SwinV2 head — end-to-end logits via funcstruct_cross_tree
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_full_funcstruct_cross_parity(ref_model):
    from multimodal_neuroimage_tpu.models.func_struct import FuncStructCross
    from multimodal_neuroimage_tpu.utils.torch_import import \
        funcstruct_cross_tree
    torch.manual_seed(51)
    L, T, IV = 2, 48, 84
    ex_d, fu_d, re_d = (1,), (1,), (1,)
    ref = ref_model.Func_Struct_Cross(
        img_size=IV, patch_size=7, in_chans=1, embed_dim=DIM,
        Ex_depths=list(ex_d), Fusion_depths=list(fu_d),
        Re_depths=list(re_d), Ex_num_heads=[6], Fusion_num_heads=[6],
        Re_num_heads=[6], window_size=WS, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.0,
        # kwargs: register_vars (model.py:53-88) + flagship config +
        # the inner plain SwinTransformerV2 (model.py:995-1032)
        fine_tune_task="binary_classification",
        dataset_name="multimodal", fmri_type="divided_frequency",
        transformer_hidden_layers=L, num_heads_mult=12,
        num_heads_2DBert=12, transformer_dropout_rate=0.0,
        sequence_length=T, intermediate_vec=IV,
        concat_method="concat", feature_map_size="same",
        feature_map_gen="no", use_FC=True, use_merge_loss=False,
        size_of_model="small", swin_embed_dim=12,
        no_init_weights=False).eval()
    _perturb(ref, std=0.02, seed=51)

    x_raw = torch.randn(2, T, IV)
    x_l = torch.randn(2, T, IV) * 0.5
    x_u = torch.randn(2, T, IV) * 0.5
    struct = torch.randn(2, IV, IV) * 0.5
    with torch.no_grad():
        want = _t2n(ref(x_raw, x_l, x_u, struct)["binary_classification"])

    ours = FuncStructCross(
        intermediate_vec=IV, transformer_hidden_layers=L,
        num_heads_2DBert=12, sequence_length=T,
        transformer_dropout_rate=0.0, concat_method="concat",
        feature_map_size="same", use_FC=True,
        fusion_embed_dim=DIM, fusion_ex_depths=ex_d, fusion_depths=fu_d,
        fusion_re_depths=re_d, fusion_ex_heads=(6,), fusion_heads=(6,),
        fusion_re_heads=(6,), fusion_drop=0.0, fusion_drop_path=0.0,
        window_size=WS, mlp_ratio=4.0, size_of_model="small",
        swin_embed_dim=12, patch_size=7,
        fine_tune_task="binary_classification")
    params = jax.tree_util.tree_map(
        jnp.asarray,
        funcstruct_cross_tree(ref.state_dict(), L, ex_d, fu_d, re_d, (2,)))
    out = ours.apply({"params": params},
                     {"fmri_raw_sequence": jnp.asarray(_t2n(x_raw)),
                      "fmri_lowfreq_sequence": jnp.asarray(_t2n(x_l)),
                      "fmri_ultralowfreq_sequence": jnp.asarray(_t2n(x_u)),
                      "struct": jnp.asarray(_t2n(struct))}, True)
    got = np.asarray(out["binary_classification"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
