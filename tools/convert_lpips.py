"""Convert LPIPS weights for --lpips_weights.

Input: the original LPIPS checkpoint the reference downloads as ``vgg.pth``
(utils.py:24-37) — torchvision VGG16 features + learned lin heads — and/or a
plain torchvision vgg16 state_dict. Output: an .npz our LPIPS/discriminator
load directly (no torch needed at train time).

    python tools/convert_lpips.py vgg.pth lpips_weights.npz
"""

from __future__ import annotations

import sys


def main(src: str, dst: str) -> None:
    import numpy as np
    import torch

    sys.path.insert(0, "/root/repo")
    from vqgan_tpu.losses.lpips import convert_torch_lpips

    sd = torch.load(src, map_location="cpu", weights_only=True)
    params = convert_torch_lpips(sd)

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
    print(f"wrote {dst}: {len(flat)} arrays")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    main(sys.argv[1], sys.argv[2])
