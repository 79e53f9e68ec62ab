"""Pallas TPU kernel: 3×3×3 stride-1 Conv3d with the temporal-tap sum fused
into the conv — the output is written to HBM exactly once, Co channels wide.

Why a kernel (BASELINE.md round-4 3D trace): the 16f/128px video step is
HBM-bound (590 GB/s = 72% of bandwidth peak at 22.5% of FLOP peak) and ~23%
of the step is pure data formatting from the tap2dfat lowering
(models/tae.py::Conv3DTap2DFat): one batched 2D conv writes a 3·Co-channel
intermediate to HBM, which a loop fusion then re-reads shifted by ±1 frame to
form the temporal-tap sum. Per conv with Ci == Co (the ResnetBlock3D bulk)
that is read x + write 3·|y| + read 3·|y| + write |y| ≈ 8 activation units
of traffic. This kernel keeps the tap accumulation in VMEM instead:

  grid = (B·T, kt∈{0,1,2})   — kt innermost, so the output block and the
                               fp32 accumulator stay resident across taps
  x spec: one whole (H, W, Ci) frame per step, index-mapped to the
          neighboring frame t+kt-1 (clamped at clip edges; the edge tap's
          contribution is masked with pl.when — zero T padding semantics,
          exactly the reference Conv3d's SAME behavior, tae.py:57-76)
  body:   nine shifted (H·W, Ci) @ (Ci, Co) MXU matmuls per tap (the 3×3
          spatial window over a once-padded VMEM copy), accumulated fp32
  kt==2:  one cast + one write of the (H, W, Co) output frame

Traffic per conv drops to 3 reads of x + 1 write of y ≈ 4 units — about 2×
less than tap2dfat on an HBM-bound step. The fp32 cross-tap accumulator is
*tighter* numerics than tap2dfat's bf16 tap sum (and than the reference's
autocast Conv3d); parity is pinned in tests/test_pallas_conv3d.py.

Backward (custom VJP):
  dx — mathematically another 3×3×3 stride-1 SAME conv of dy with the
       spatially+temporally flipped, Ci/Co-transposed kernel: the SAME
       Pallas kernel is reused, so the backward's tap sum is fused too.
  dk — jax.linear_transpose of the direct XLA NDHWC conv: XLA's native
       conv weight-grad op (contraction over all B·T·H·W positions), which
       has no fat intermediate to begin with.

Same (3, 3, 3, Ci, Co) parameter tensor as every other conv3d impl —
checkpoint/torch-import parity preserved. Off-TPU the kernel runs in
interpret mode so the whole path is unit-testable on CPU.

VMEM budget at the worst bench level (128×128 frames, Ci=Co=64, bf16):
x block 2 MB (×2 pipelining) + fp32 accumulator 4 MB + out block 2 MB +
padded copy ~2 MB + weights 0.2 MB ≈ 12 MB of the 16 MB/core — whole-frame
blocks fit precisely because c·h·w stays roughly constant across VAE levels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _x_index(i, kt, *, t_len):
    """Block index of the input frame feeding tap ``kt`` of output frame
    ``i``: the neighbor t+kt-1 within the same clip, clamped at the clip
    boundary (the clamped duplicate fetch is masked off in the kernel)."""
    base = (i // t_len) * t_len
    return (base + jnp.clip(i - base + kt - 1, 0, t_len - 1), 0, 0, 0)


def _kernel(x_ref, k_ref, o_ref, acc_ref, *, t_len: int):
    i = pl.program_id(0)
    kt = pl.program_id(1)
    tloc = jax.lax.rem(i, t_len)

    @pl.when(kt == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    src = tloc + kt - 1
    valid = jnp.logical_and(src >= 0, src < t_len)

    @pl.when(valid)
    def _accumulate():
        x = x_ref[0]  # (H, W, Ci)
        h, w, _ = x.shape
        xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
        for dh in range(3):
            for dw in range(3):
                win = xp[dh : dh + h, dw : dw + w, :].reshape(h * w, -1)
                acc_ref[...] += jnp.dot(
                    win, k_ref[kt, dh, dw],
                    preferred_element_type=jnp.float32,
                )

    @pl.when(kt == 2)
    def _emit():
        h, w = o_ref.shape[1], o_ref.shape[2]
        o_ref[0] = acc_ref[...].reshape(h, w, -1).astype(o_ref.dtype)


def _conv3d_pallas(x: jax.Array, kernel: jax.Array, interpret: bool):
    b, t, h, w, ci = x.shape
    co = kernel.shape[-1]
    xf = x.reshape(b * t, h, w, ci)
    out = pl.pallas_call(
        functools.partial(_kernel, t_len=t),
        grid=(b * t, 3),
        in_specs=[
            pl.BlockSpec(
                (1, h, w, ci),
                functools.partial(_x_index, t_len=t),
                memory_space=pltpu.VMEM,
            ),
            # whole (3,3,3,Ci,Co) weight tensor resident in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, co), lambda i, kt: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * t, h, w, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((h * w, co), jnp.float32)],
        interpret=interpret,
    )(xf, kernel)
    return out.reshape(b, t, h, w, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_ttap(
    x: jax.Array, kernel: jax.Array, interpret: bool = False
) -> jax.Array:
    """Fused-tap 3×3×3 stride-1 SAME Conv3d over NDHWC.

    ``x``: (B, T, H, W, Ci); ``kernel``: (3, 3, 3, Ci, Co) in the compute
    dtype. Zero padding on T/H/W (reference Conv3d semantics). Differentiable;
    see module docstring for the VJP structure.
    """
    return _conv3d_pallas(x, kernel, interpret)


def _conv3d_fwd(x, kernel, interpret):
    return _conv3d_pallas(x, kernel, interpret), (x, kernel)


def _conv3d_bwd(interpret, res, dy):
    x, kernel = res
    # dx: conv of dy with the flipped, Ci/Co-transposed kernel — the same
    # fused-tap Pallas kernel (identity verified in tests against autodiff
    # of the direct XLA conv)
    kf = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _conv3d_pallas(dy, kf, interpret)

    # dk: transpose of the (linear-in-kernel) direct conv — XLA's native
    # conv weight-grad, one op, no fat intermediates
    def _lin(kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    (dk,) = jax.linear_transpose(_lin, kernel)(dy)
    return dx, dk


conv3d_ttap.defvjp(_conv3d_fwd, _conv3d_bwd)
