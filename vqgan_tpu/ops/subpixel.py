"""Fused nearest-2x-upsample + 3x3(x3) conv via subpixel phase kernels.

The reference Upsample blocks (ae.py:157-167, tae.py:107-117) materialize the
nearest-neighbor 2x-upsampled tensor and run a full 3x3(x3) conv over it.
Because nearest upsampling repeats each input voxel, conv(upsample(x)) is
exactly equal to a family of small "phase" convs applied directly to x and
interleaved (depth-to-space): for output index 2v+p (per dim, p in {0,1}),

    y[2v+p] = sum_k w[k] * x[floor((2v+p+k)/2)]
            = phase-p 2-tap conv over x, taps [w0, w1+w2] (p=0)
                                         or [w0+w1, w2]   (p=1).

This never writes the 4x/8x upsampled activation to HBM and does 4 (2D) / 8
(3D) MACs per output voxel instead of 9 / 27 — a 2.25x / 3.4x FLOP cut on the
decoder's upsample convs with identical parameters and identical math (the
phase kernels are linear combinations of the (3,3[,3],Ci,Co) kernel, built
inside the traced function so gradients flow to the canonical tensor and
checkpoints/torch-import stay bit-compatible).

All phases are evaluated by ONE conv with Co·(4 or 8) output channels (phase
index folded into out-channels), so the MXU sees a single wide contraction;
the interleave is a slice+stack+reshape XLA fuses into one loop fusion.

``upsample2x_conv2d_dilated`` / ``..._conv3d_dilated`` compute the SAME
function a third way: as a stride-2 transposed conv (lhs-dilated conv) with
a derived 4-tap-per-dim kernel — the backward-input conv pattern the TPU
conv emitter handles natively (it skips the dilation zeros; XLA cost
analysis confirms the 4/9 / 8/27 MAC count). The output is written directly
by the conv, so the phase-interleave loop fusion disappears entirely.
Measured on v5e at the three flagship decoder shapes (BASELINE.md round 4):
fwd+bwd 12-29% faster than the phase-conv form — this is the
``upsample_impl="auto"`` TPU default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Module-level constants MUST be numpy, not jnp: this module is imported
# lazily from inside traced functions (nn.remat regions), and a jnp.array
# built during an active trace is a tracer — storing it in a module global
# leaks it into every later trace (UnexpectedTracerError, found when
# upsample_impl=fused first ran under remat_policy="conv").

# A[phase, tap, orig_tap]: per-dim linear map from the 3 original kernel taps
# to the 2 phase-conv taps (see module docstring).
_A = np.array(
    [[[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]],
     [[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]],
    dtype=np.float32,
)

# A4[t4, orig_tap]: per-dim map from the 3 original taps to the 4 taps of
# the equivalent stride-2 transposed-conv kernel. Derivation: with input
# dilation 2 and padding (2, 2), output o reads dilated-input position
# o - 2 + t4, which is x[j] iff o - 2 + t4 = 2j; solving per phase gives
#   K4[0] = w0, K4[1] = w0 + w1, K4[2] = w1 + w2, K4[3] = w2.
_A4 = np.array(
    [[1.0, 0.0, 0.0],
     [1.0, 1.0, 0.0],
     [0.0, 1.0, 1.0],
     [0.0, 0.0, 1.0]],
    dtype=np.float32,
)


def upsample2x_conv2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """conv2d_3x3_SAME(nearest_upsample_2x(x), kernel), computed fused.

    x: (B, H, W, Ci); kernel: (3, 3, Ci, Co). Returns (B, 2H, 2W, Co).
    Compute dtype follows x/kernel (cast before calling).
    """
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    a = _A.astype(kernel.dtype)
    # (th, tw, ci, ph, pw, co) -> (2, 2, ci, 4*co); block (ph*2+pw) holds co
    kf = jnp.einsum("pai,qbj,ijcf->abcpqf", a, a, kernel)
    kf = kf.reshape(2, 2, ci, 4 * co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kf, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (b, h+1, w+1, 4co)
    rows = []
    for p in (0, 1):
        cols = []
        for q in (0, 1):
            blk = (p * 2 + q) * co
            cols.append(y[:, p : p + h, q : q + w, blk : blk + co])
        rows.append(jnp.stack(cols, axis=3))  # (b, h, w, 2, co)
    g = jnp.stack(rows, axis=2)  # (b, h, 2, w, 2, co)
    return g.reshape(b, 2 * h, 2 * w, co)


def upsample2x_conv2d_dilated(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """conv2d_3x3_SAME(nearest_upsample_2x(x), kernel) as ONE lhs-dilated
    conv (stride-2 transposed conv, derived (4, 4) kernel) — identical math
    and parameters, output written directly with no interleave pass.

    x: (B, H, W, Ci); kernel: (3, 3, Ci, Co). Returns (B, 2H, 2W, Co).
    """
    a = _A4.astype(kernel.dtype)
    k4 = jnp.einsum("pi,qj,ijcf->pqcf", a, a, kernel)  # (4, 4, ci, co)
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def upsample2x_conv3d_dilated(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """conv3d_3x3x3_SAME(nearest_upsample_2x_3d(x), kernel) as ONE
    lhs-dilated conv (derived (4, 4, 4) kernel).

    x: (B, T, H, W, Ci); kernel: (3, 3, 3, Ci, Co).
    Returns (B, 2T, 2H, 2W, Co).
    """
    a = _A4.astype(kernel.dtype)
    k4 = jnp.einsum("pi,qj,rk,ijkcf->pqrcf", a, a, a, kernel)
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1, 1), ((2, 2), (2, 2), (2, 2)),
        lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def upsample2x_conv3d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """conv3d_3x3x3_SAME(nearest_upsample_2x_3d(x), kernel), computed fused.

    x: (B, T, H, W, Ci); kernel: (3, 3, 3, Ci, Co).
    Returns (B, 2T, 2H, 2W, Co).
    """
    b, t, h, w, ci = x.shape
    co = kernel.shape[-1]
    a = _A.astype(kernel.dtype)
    # (tt, th, tw, ci, pt, ph, pw, co) -> (2,2,2,ci,8co); block pt*4+ph*2+pw
    kf = jnp.einsum("pai,qbj,rck,ijkdf->abcdpqrf", a, a, a, kernel)
    kf = kf.reshape(2, 2, 2, ci, 8 * co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, kf, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (b, t+1, h+1, w+1, 8co)
    t_parts = []
    for p in (0, 1):
        rows = []
        for q in (0, 1):
            cols = []
            for r in (0, 1):
                blk = (p * 4 + q * 2 + r) * co
                cols.append(
                    y[:, p : p + t, q : q + h, r : r + w, blk : blk + co]
                )
            rows.append(jnp.stack(cols, axis=4))  # (b, t, h, w, 2, co)
        t_parts.append(jnp.stack(rows, axis=3))  # (b, t, h, 2, w, 2, co)
    g = jnp.stack(t_parts, axis=2)  # (b, t, 2, h, 2, w, 2, co)
    return g.reshape(b, 2 * t, 2 * h, 2 * w, co)
