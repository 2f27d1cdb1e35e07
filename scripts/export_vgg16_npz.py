"""Export torchvision VGG16 weights to the npz consumed by
multimodal_neuroimage_tpu.nn.perceptual.load_vgg16_npz.

The reference's perceptual loss uses torchvision's pretrained VGG16
(reference losses.py:90-120, ``vgg16(pretrained=True).features``); this
image ships torch but not torchvision, so numerical parity of the
perceptual loss requires exporting the weights wherever torchvision (or a
downloaded state_dict) exists and pointing ``--percept_weights_npz`` at
the artifact. Usage:

  # where torchvision is installed (downloads the pretrained weights):
  python scripts/export_vgg16_npz.py --out vgg16_stage12.npz

  # from a saved state_dict (full VGG16 or just .features.*):
  python scripts/export_vgg16_npz.py --state-dict vgg16.pth --out vgg16_stage12.npz

Only the first two stages are exported (conv1_1..conv2_2 = features.0/2/5/7
— all the reference's Percept_Loss reads, losses.py:96-104). Kernels are
transposed OIHW -> HWIO for flax. The export is activation-verified against
torch when torch is importable.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# torchvision VGG16 .features indices for the first two stages
_LAYERS = {"conv1_1": 0, "conv1_2": 2, "conv2_1": 5, "conv2_2": 7}


def state_dict_to_npz_arrays(sd) -> dict:
    """Torch VGG16 state_dict (full model or .features only) -> flat dict of
    np arrays keyed conv{i}_{j}/kernel|bias with HWIO kernels."""
    def find(idx: int, leaf: str):
        for key in (f"features.{idx}.{leaf}", f"{idx}.{leaf}"):
            if key in sd:
                return np.asarray(sd[key].detach().cpu().numpy()
                                  if hasattr(sd[key], "detach") else sd[key])
        raise KeyError(f"state_dict has no features.{idx}.{leaf}")

    out = {}
    for name, idx in _LAYERS.items():
        w = find(idx, "weight")                      # (O, I, H, W)
        out[f"{name}/kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(
            np.float32)                              # -> (H, W, I, O)
        out[f"{name}/bias"] = find(idx, "bias").astype(np.float32)
    return out


def verify_against_torch(sd, npz_arrays: dict, rtol: float = 1e-4) -> None:
    """Run one random image through torch's conv stack and the flax module
    with the exported weights; assert relu1_2/relu2_2 activations match."""
    import torch
    import torch.nn.functional as F

    from multimodal_neuroimage_tpu.nn.perceptual import (Vgg16Features,
                                                         load_vgg16_npz)
    import jax.numpy as jnp
    import tempfile

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)

    def t(idx, h):
        w = sd.get(f"features.{idx}.weight", sd.get(f"{idx}.weight"))
        b = sd.get(f"features.{idx}.bias", sd.get(f"{idx}.bias"))
        w = w if hasattr(w, "shape") else torch.as_tensor(w)
        return F.relu(F.conv2d(h, torch.as_tensor(np.asarray(w)),
                               torch.as_tensor(np.asarray(b)), padding=1))

    with torch.no_grad():
        h = t(0, torch.as_tensor(x))
        h = t(2, h)
        r12_t = h.numpy()
        h = F.max_pool2d(h, 2, 2)
        h = t(5, h)
        r22_t = t(7, h).numpy()

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **npz_arrays)
        variables = load_vgg16_npz(f.name)
    r12_j, r22_j = Vgg16Features().apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(r12_j), (0, 3, 1, 2)),
                               r12_t, rtol=rtol, atol=1e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(r22_j), (0, 3, 1, 2)),
                               r22_t, rtol=rtol, atol=1e-4)
    print("[export_vgg16] activation parity torch vs flax: OK")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--state-dict", default=None,
                    help="torch .pth state_dict (else torchvision download)")
    ap.add_argument("--no-verify", action="store_true")
    args = ap.parse_args()

    if args.state_dict:
        import torch
        sd = torch.load(args.state_dict, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    else:
        try:
            from torchvision.models import vgg16
        except ImportError:
            print("torchvision is not installed; pass --state-dict instead",
                  file=sys.stderr)
            return 2
        sd = vgg16(weights="IMAGENET1K_V1").state_dict()

    arrays = state_dict_to_npz_arrays(sd)
    if not args.no_verify:
        verify_against_torch(sd, arrays)
    np.savez(args.out, **arrays)
    print(f"[export_vgg16] wrote {args.out}: "
          f"{sorted(arrays)} ({sum(a.nbytes for a in arrays.values())/1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
