"""VGG16-backed multi-scale patch discriminator (reference utils.py:143-203).

ScalingLayer → trainable VGG16 backbone → 5 binary-classifier conv heads (one
per feature tap), each head's final conv **zero-weight** initialized
(utils.py:161-185, weights only — biases keep the torch default init), heads'
flattened patch logits summed: every head contributes logits over the same
32×32 patch grid for a 512² input (16×16 at 256²), so the sum is a per-patch
multi-scale vote (utils.py:187-203).

Head specs (exactly the reference's):
  1: 64→32 (k4 s4) → ReLU → 32→1 (k4 s4)
  2: 128→64 (k4 s4) → ReLU → 64→1 (k2 s2)
  3: 256→128 (k2 s2) → ReLU → 128→1 (k2 s2)
  4: 512→1 (k2 s2)
  5: 512→1 (k1 s1)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqgan_tpu.losses.vgg import ScalingLayer, VGG16Features, convert_torch_vgg16
from vqgan_tpu.models.blocks import torch_conv_kernel_init

Dtype = Any


def _torch_conv_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _head_conv(
    features: int,
    kernel: int,
    stride: int,
    fan_in: int,
    zero_kernel: bool,
    dtype: Dtype,
    name: str,
) -> nn.Conv:
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding="VALID",
        kernel_init=nn.initializers.zeros if zero_kernel else torch_conv_kernel_init,
        bias_init=_torch_conv_bias_init(fan_in),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class PatchDiscriminator(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [-1,1] → (B, P) patch logits."""
        x = ScalingLayer()(x)
        f1, f2, f3, f4, f5 = VGG16Features(dtype=self.dtype, name="vgg")(x)
        b = x.shape[0]

        h1 = _head_conv(32, 4, 4, 64 * 16, False, self.dtype, "bc1_conv0")(f1)
        h1 = nn.relu(h1)
        h1 = _head_conv(1, 4, 4, 32 * 16, True, self.dtype, "bc1_conv1")(h1)

        h2 = _head_conv(64, 4, 4, 128 * 16, False, self.dtype, "bc2_conv0")(f2)
        h2 = nn.relu(h2)
        h2 = _head_conv(1, 2, 2, 64 * 4, True, self.dtype, "bc2_conv1")(h2)

        h3 = _head_conv(128, 2, 2, 256 * 4, False, self.dtype, "bc3_conv0")(f3)
        h3 = nn.relu(h3)
        h3 = _head_conv(1, 2, 2, 128 * 4, True, self.dtype, "bc3_conv1")(h3)

        h4 = _head_conv(1, 2, 2, 512 * 4, True, self.dtype, "bc4_conv0")(f4)
        h5 = _head_conv(1, 1, 1, 512, True, self.dtype, "bc5_conv0")(f5)

        logits = (
            h1.reshape(b, -1)
            + h2.reshape(b, -1)
            + h3.reshape(b, -1)
            + h4.reshape(b, -1)
            + h5.reshape(b, -1)
        )
        return logits.astype(jnp.float32)


def init_discriminator_params(
    rng: jax.Array, image_size: int = 256, dtype=jnp.float32
):
    model = PatchDiscriminator(dtype=dtype)
    x = jnp.zeros((1, image_size, image_size, 3))
    return model, model.init(rng, x)["params"]


def _identity_temporal_init(key, shape, dtype=jnp.float32):
    """(kt, 1, 1, 1, C) depthwise kernel with the CENTER temporal tap = 1:
    the mixer starts as identity, so a fresh TubeletDiscriminator computes
    exactly the per-frame PatchDiscriminator until training moves it."""
    k = jnp.zeros(shape, dtype)
    return k.at[shape[0] // 2].set(1.0)


class TubeletDiscriminator(nn.Module):
    """Spatio-temporal patch discriminator for the video GAN — beyond the
    reference (whose tae.py is never trained; the per-frame 2D disc in
    train/step3d.py cannot see temporal artifacts like flicker or texture
    crawl). TPU-first design: the 2D VGG16 backbone runs on every frame as
    one (B·T) batch — the MXU-efficient path, with the SAME backbone
    parameter tree as PatchDiscriminator so ``--disc_backbone_weights``
    (pretrained torchvision VGG16, reference utils.py:147-156) drops in
    unchanged — then each feature tap passes a depthwise temporal conv
    (kernel 3, SAME, identity-initialized) before its spatial patch head,
    so the multi-scale patch vote judges short-range motion coherence, not
    just per-frame realism. Head specs and zero-init finals exactly as the
    2D heads. Output: (B, T·P) patch logits — gan_disc_loss consumes any
    (B, N) logit layout."""

    dtype: Dtype = jnp.float32

    def _tmix(self, f: jax.Array, b: int, t: int, name: str) -> jax.Array:
        """(B·T, h, w, c) → depthwise temporal mix → (B·T, h, w, c)."""
        bt, h, w, c = f.shape
        f5 = f.reshape(b, t, h, w, c)
        f5 = nn.Conv(
            c,
            (min(3, t), 1, 1),
            padding="SAME",
            feature_group_count=c,
            use_bias=False,
            kernel_init=_identity_temporal_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )(f5)
        return f5.reshape(bt, h, w, c)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, T, H, W, 3) in [-1,1] → (B, T·P) spatio-temporal patch logits."""
        b, t, hh, ww, _ = x.shape
        xf = x.reshape(b * t, hh, ww, 3)
        xf = ScalingLayer()(xf)
        f1, f2, f3, f4, f5 = VGG16Features(dtype=self.dtype, name="vgg")(xf)
        f1 = self._tmix(f1, b, t, "tmix1")
        f2 = self._tmix(f2, b, t, "tmix2")
        f3 = self._tmix(f3, b, t, "tmix3")
        f4 = self._tmix(f4, b, t, "tmix4")
        f5 = self._tmix(f5, b, t, "tmix5")

        h1 = _head_conv(32, 4, 4, 64 * 16, False, self.dtype, "bc1_conv0")(f1)
        h1 = nn.relu(h1)
        h1 = _head_conv(1, 4, 4, 32 * 16, True, self.dtype, "bc1_conv1")(h1)

        h2 = _head_conv(64, 4, 4, 128 * 16, False, self.dtype, "bc2_conv0")(f2)
        h2 = nn.relu(h2)
        h2 = _head_conv(1, 2, 2, 64 * 4, True, self.dtype, "bc2_conv1")(h2)

        h3 = _head_conv(128, 2, 2, 256 * 4, False, self.dtype, "bc3_conv0")(f3)
        h3 = nn.relu(h3)
        h3 = _head_conv(1, 2, 2, 128 * 4, True, self.dtype, "bc3_conv1")(h3)

        h4 = _head_conv(1, 2, 2, 512 * 4, True, self.dtype, "bc4_conv0")(f4)
        h5 = _head_conv(1, 1, 1, 512, True, self.dtype, "bc5_conv0")(f5)

        logits = (
            h1.reshape(b, -1)
            + h2.reshape(b, -1)
            + h3.reshape(b, -1)
            + h4.reshape(b, -1)
            + h5.reshape(b, -1)
        )
        return logits.astype(jnp.float32)


# (our head conv name) ← (reference Sequential index, utils.py:156-185)
_HEAD_KEY_MAP = {
    "bc1_conv0": "binary_classifier1.0",
    "bc1_conv1": "binary_classifier1.2",
    "bc2_conv0": "binary_classifier2.0",
    "bc2_conv1": "binary_classifier2.2",
    "bc3_conv0": "binary_classifier3.0",
    "bc3_conv1": "binary_classifier3.2",
    "bc4_conv0": "binary_classifier4.0",
    "bc5_conv0": "binary_classifier5.0",
}


def convert_torch_patch_discriminator(state_dict: dict) -> dict:
    """Convert a reference ``PatchDiscriminator`` state_dict
    (utils.py:143-203: VGG backbone under slice{n}.0.{idx}, five
    binary_classifier heads) into this module's params. Kernels OIHW→HWIO."""
    import numpy as np

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: dict = {"vgg": convert_torch_vgg16(state_dict)}
    for ours, theirs in _HEAD_KEY_MAP.items():
        w = state_dict.get(f"{theirs}.weight")
        b = state_dict.get(f"{theirs}.bias")
        if w is None or b is None:
            raise KeyError(f"missing discriminator head {theirs}")
        params[ours] = {
            "kernel": to_np(w).transpose(2, 3, 1, 0),
            "bias": to_np(b),
        }
    return params


def load_disc_backbone(params: dict, path: str) -> dict:
    """Start the PatchDiscriminator from a pretrained VGG16 backbone — the
    reference initializes its discriminator from pretrained torchvision
    VGG16 features (utils.py:147-156). ``path``: the
    ``vgg16_features.npz`` written by tools/fetch_lpips.py (flat "a/b/c"
    keys with a top-level "vgg" subtree), or a torch ``.pth`` of
    torchvision vgg16 ``features``. The five classifier heads keep their
    fresh (zero-final) init, as in the reference."""
    import numpy as np

    from vqgan_tpu.losses.lpips import _merge

    if path.endswith(".npz"):
        loaded = dict(np.load(path, allow_pickle=True))
        nested: dict = {}
        for key, arr in loaded.items():
            node = nested
            *mods, leaf = key.split("/")
            for m in mods:
                node = node.setdefault(m, {})
            node[leaf] = arr
        vgg = nested.get("vgg", nested)
    else:
        import torch

        from vqgan_tpu.losses.vgg import convert_torch_vgg16

        vgg = convert_torch_vgg16(
            torch.load(path, map_location="cpu", weights_only=True)
        )
    return {**params, "vgg": _merge(params["vgg"], vgg)}
