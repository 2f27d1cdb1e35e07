"""Load the reference's torch modules as a behavioral oracle.

The reference stack (/root/reference) imports timm only for DropPath /
to_2tuple / trunc_normal_ (swin_v2_module.py:12); timm is absent from this
image, so a minimal stub is installed before loading. Used by the golden
activation-parity tests and by scripts/behavioral_parity.py (end-to-end
training-trajectory parity, VERDICT r2 item 4). CPU-only: the reference's
`.to(get_device())` CUDA-ism is patched the same way tests/test_swin_golden.py
does.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_timm_stub() -> None:
    """Minimal timm.models.layers with the three symbols the reference uses
    (identical to tests/test_swin_golden.py's stub)."""
    if "timm.models.layers" in sys.modules:
        return
    import torch
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

        def forward(self, x):  # parity runs use drop_path 0 -> identity
            return x

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath, layers.to_2tuple, layers.trunc_normal_ = (
        DropPath, to_2tuple, trunc_normal_)
    timm.models, models.layers = models, layers
    for m in (timm, models, layers):
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
    sys.modules.update({"timm": timm, "timm.models": models,
                        "timm.models.layers": layers})

    # reference CUDA-ism: swin_v2_module.py:154 .to(logit_scale.get_device()),
    # which returns -1 on CPU tensors
    orig = torch.Tensor.get_device

    def _get_device(self):
        d = orig(self)
        return "cpu" if d == -1 else d

    torch.Tensor.get_device = _get_device


def load_reference_model_module():
    """Import the reference's model.py (with its modules/ package deps) as a
    plain module. Returns the loaded module object."""
    install_timm_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    spec = importlib.util.spec_from_file_location(
        "reference_model", f"{REFERENCE_ROOT}/model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
