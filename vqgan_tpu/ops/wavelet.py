"""Multi-channel 2D wavelet decomposition (encoder front-end).

Reimplements the reference's Haar-like analysis bank (utils.py:206-247):
6-tap lowpass/highpass filters whose outer products form 4 separable 2D
filters (LL, LH, HL, HH), applied per input channel with stride 2 after a
2-pixel zero pad. Output is (B, H/2, W/2, 4*C) with the channel order
``c*4 + f`` matching the reference's per-channel concat + reshape
(utils.py:237-247).

TPU-native formulation: a single grouped ``lax.conv_general_dilated`` with
``feature_group_count=C`` over NHWC instead of a Python loop of per-channel
convs — one conv instruction the XLA TPU backend tiles directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# reference utils.py:206-209
DEC_LO = np.array([-0.1768, 0.3536, 1.0607, 0.3536, -0.1768, 0.0000], np.float32)
DEC_HI = np.array([0.0000, -0.0000, 0.3536, -0.7071, 0.3536, -0.0000], np.float32)


@functools.lru_cache(maxsize=None)
def _filters_hw4() -> np.ndarray:
    """(6, 6, 4) filter bank; filter f at [..., f].

    Reference stacks outer products with the *first* factor indexing columns
    (dec_lo.unsqueeze(0) * dec_hi.unsqueeze(1) has rows=hi, cols=lo;
    utils.py:211-219), i.e. filter[f][i, j]:
      f=0: lo[i]*lo[j], f=1: hi[i]*lo[j], f=2: lo[i]*hi[j], f=3: hi[i]*hi[j].
    """
    lo, hi = DEC_LO, DEC_HI
    f0 = np.outer(lo, lo)  # rows lo, cols lo
    f1 = np.outer(hi, lo)  # dec_lo.unsqueeze(0)*dec_hi.unsqueeze(1): rows hi
    f2 = np.outer(lo, hi)
    f3 = np.outer(hi, hi)
    return np.stack([f0, f1, f2, f3], axis=-1)  # (6,6,4)


def wavelet_transform_multi_channel(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order c*4+f (reference
    utils.py:229-247)."""
    b, h, w, c = x.shape
    filt = jnp.asarray(_filters_hw4(), dtype=jnp.float32)  # (6,6,4)
    # Grouped conv: group g = input channel c. Output channels are ordered
    # group-major, so kernel HWIO with I=1, O=4C where O index = c*4+f:
    # repeat the 4-filter block once per input channel.
    kernel = jnp.concatenate([filt[:, :, None, :]] * c, axis=-1)  # (6,6,1,4C)
    xf = x.astype(jnp.float32)
    xf = jnp.pad(xf, ((0, 0), (2, 2), (2, 2), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xf,
        kernel,
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out.astype(x.dtype)
