"""Generate an ALTERNATE random perceptual-net weight file for the
proxy-variance study (VERDICT r4 #7): a reference-layout LPIPS state dict
(random VGG16 taps + random non-uniform lin heads, seeded) converted
through the exact tools/fetch_lpips.py path real pretrained weights would
take, so a run launched with ``--lpips_weights <out>`` trains against a
DIFFERENT perceptual net than the default deterministic seed-42 random-VGG
— everything else identical.

    python tools/make_alt_lpips.py --seed 7 --out /tmp/alt_lpips_seed7.npz

CPU-only; uses the reference-module stubs from tests/reference_compat.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="/tmp/alt_lpips.npz")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from tests.reference_compat import (
        import_reference_module,
        install_random_vgg16,
    )

    install_random_vgg16(seed=args.seed)
    torch.manual_seed(args.seed)  # the lin-head inits
    # reference LPIPS() torch.load()s a vgg.pth from cwd (strict=False);
    # feed it an empty one so construction uses the random inits
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cwd = os.getcwd()
        os.chdir(td)
        try:
            torch.save({}, "vgg.pth")
            ref_utils = import_reference_module("utils")
            sd = ref_utils.LPIPS().state_dict()
        finally:
            os.chdir(cwd)

    from vqgan_tpu.losses.lpips import convert_torch_lpips, load_lpips_params

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from fetch_lpips import _flat_npz

    params = convert_torch_lpips(sd)
    n = _flat_npz(params, args.out)
    load_lpips_params(args.out, jax.random.PRNGKey(0), image_size=64)
    print(f"wrote {args.out} ({n} arrays, seed {args.seed}), "
          "verified via load_lpips_params")


if __name__ == "__main__":
    main()
