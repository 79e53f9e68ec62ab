"""VGG16 feature extractor (NHWC, flax.linen) for LPIPS and the patch
discriminator.

Mirrors torchvision VGG16 ``.features`` cut at the reference's 5 taps
(utils.py:92-131): relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 — i.e. feature
indices [0:4], [4:9], [9:16], [16:23], [23:30] where each slice starts with
the preceding maxpool.

Weights: torchvision pretrained weights are not available in this image
(zero egress); the module initializes with a fixed He-normal scheme and a
converter (``convert_torch_vgg16``) maps a torchvision ``vgg16`` state_dict
into this tree when one is provided on disk. For LPIPS-as-*training-loss*
a frozen random VGG is a known-serviceable fallback (random-feature
perceptual losses train comparably); for LPIPS-as-*metric* comparability,
import real weights. The discriminator trains its backbone from whatever
init it starts with (reference starts from pretrained, utils.py:148).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# (out_channels per conv, taps) of VGG16 features; 'M' = maxpool 2x2/2.
VGG16_LAYOUT = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
                "M", 512, 512, 512)
# taps AFTER the relu of these conv indices (0-based over convs only):
# relu1_2 → conv 1, relu2_2 → conv 3, relu3_3 → conv 6, relu4_3 → conv 9,
# relu5_3 → conv 12
TAP_AFTER_CONV = (1, 3, 6, 9, 12)
TAP_CHANNELS = (64, 128, 256, 512, 512)  # reference utils.py:13


class VGG16Features(nn.Module):
    """Returns the 5 relu taps. Conv params named conv_{i} for i over the 13
    convs, mapping to torchvision features.{0,2,5,7,10,12,14,17,19,21,24,26,28}."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        taps = []
        conv_idx = 0
        for item in VGG16_LAYOUT:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(
                item,
                (3, 3),
                padding="SAME",
                kernel_init=nn.initializers.he_normal(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{conv_idx}",
            )(x)
            x = nn.relu(x)
            if conv_idx in TAP_AFTER_CONV:
                taps.append(x)
            conv_idx += 1
        return tuple(taps)


# torchvision features module indices of the 13 convs, in order
TORCHVISION_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_torch_vgg16(state_dict: dict) -> dict:
    """Map a torchvision vgg16 ``features.*`` state_dict (or the ``net.slice*``
    re-wrapped form used by the reference's LPIPS) to VGG16Features params.

    Accepts numpy arrays or torch tensors; kernels OIHW → HWIO.
    """
    import numpy as np

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    # normalize keys to "features.{idx}.weight"
    norm = {}
    for k, v in state_dict.items():
        kk = k
        for prefix in ("net.", "module."):
            if kk.startswith(prefix):
                kk = kk[len(prefix):]
        if kk.startswith("slice"):
            # reference vgg16 wrapper: slice{n}.{idx}.weight keeps torchvision
            # indices (utils.py:102-111); the PatchDiscriminator wraps each
            # slice in one more Sequential, giving slice{n}.0.{idx}.weight
            # (utils.py:150-154)
            rest = kk.split(".", 1)[1]
            parts = rest.split(".")
            # disc form has an extra Sequential level: slice{n}.0.{idx}.{w|b}
            if len(parts) == 3 and parts[0] == "0":
                rest = ".".join(parts[1:])
            kk = "features." + rest
        norm[kk] = v
    params = {}
    for j, idx in enumerate(TORCHVISION_CONV_INDICES):
        w = norm.get(f"features.{idx}.weight")
        b = norm.get(f"features.{idx}.bias")
        if w is None:
            raise KeyError(f"missing VGG16 conv features.{idx}.weight")
        params[f"conv_{j}"] = {
            "kernel": to_np(w).transpose(2, 3, 1, 0),
            "bias": to_np(b),
        }
    return params


class ScalingLayer(nn.Module):
    """Fixed shift/scale mapping [-1,1] images to VGG input statistics
    (reference utils.py:60-71)."""

    def __call__(self, x: jax.Array) -> jax.Array:
        shift = jnp.array([-0.030, -0.088, -0.188], x.dtype)
        scale = jnp.array([0.458, 0.448, 0.450], x.dtype)
        return (x - shift) / scale
