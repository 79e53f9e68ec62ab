"""Pallas TPU kernel: 3×3×3 stride-1 Conv3d with the temporal-tap sum fused
into the conv — the output is written to HBM exactly once, Co channels wide.

Why a kernel (BASELINE.md round-4 3D trace): the 16f/128px video step is
HBM-bound (590 GB/s = 72% of bandwidth peak at 22.5% of FLOP peak) and ~23%
of the step is pure data formatting from the tap2dfat lowering
(models/tae.py::Conv3DTap2DFat): one batched 2D conv writes a 3·Co-channel
intermediate to HBM, which a loop fusion then re-reads shifted by ±1 frame to
form the temporal-tap sum. Per conv with Ci == Co (the ResnetBlock3D bulk)
that is read x + write 3·|y| + read 3·|y| + write |y| ≈ 8 activation units
of traffic. This kernel keeps the tap accumulation in VMEM instead.

Blocking (v2 — the v1 whole-frame blocks OOMed the 16 MB VMEM scoped stack
on hardware at the 128×128 levels: lane padding rounds Ci=64→128, so
x + out + fp32 acc alone were 3×8 MB): the output frame is split into
``bh``-row horizontal bands, and the 3×3 spatial window's one-row halo on
each side is fetched through two extra *narrow* block specs of the SAME
input array — an 8-row band containing exactly the row above the block
(its last row) and one containing the row below (its first row). Pallas
block indices are block-granular, so the halo bands are the finest
overlap expressible without manual DMA; at bh=32 they add 16/32 = 50% read
amplification, keeping total traffic ≈ 3·1.5 reads + 1 write ≈ 5.5 units —
still ~1.5× less than tap2dfat on an HBM-bound step.

  grid = (B·T, H/bh, kt∈{0,1,2})  — kt innermost, so the fp32 accumulator
                                    stays resident across taps
  x specs: cur  (1, bh, W, Ci) band of the neighboring frame t+kt-1
                (clamped at clip edges; the clamp is masked to exact
                zero-T-pad semantics, reference Conv3d tae.py:57-76)
           prev (1, 8, W, Ci) band whose LAST row is the row above cur
           next (1, 8, W, Ci) band whose FIRST row is the row below cur
                (both clamped at frame edges and masked to zero — exact
                SAME spatial padding)
  body:    assemble the (bh+2, W+2, Ci) padded strip in VMEM, then nine
           shifted (bh·W, Ci) @ (Ci, Co) MXU matmuls per tap, fp32 acc
  kt==2:   one cast + one write of the (bh, W, Co) output band

The fp32 cross-tap accumulator is *tighter* numerics than tap2dfat's bf16
tap sum (and than the reference's autocast Conv3d); parity is pinned in
tests/test_pallas_conv3d.py.

MEASURED OUTCOME (BASELINE.md rounds 4-5, real v5e; the full story):
  r4: nine K=Ci dots — 181.6 f/s at the 16f/128px bench vs 246.3 for
      tap2dfat (≤25% MXU fill at Ci=Co=64). The im2col fix was thought
      blocked on Mosaic ("result/input offset mismatch on non-concat
      dimension").
  r5: the probe (tools/probe_mosaic_geometry.py) showed Mosaic DOES lower
      the lane-dim concat of shifted windows at lane-aligned Ci, so the
      fat-K forms were built (k_group=3 per-dh / 9 full im2col) and
      measured. Per-level microbench (tools/bench_conv3d_levels.py,
      fwd+bwd): at 64ch tap2dfat wins (42.3 vs 37.8 TF/s — N=Co=64 fills
      half the MXU lanes regardless of K); at 128ch the kernel wins
      (71.8 vs 62.2, +15%) and at 256ch (45.2 vs 42.5, +6%). End-to-end,
      pallas-everywhere = 199.8 f/s, mixed (pallas at >=128ch only) =
      239.7, tap2dfat = 246.3: the isolated >=128ch wins are eaten at the
      fusion boundary — XLA fuses norm/silu chains into its own convs but
      cannot fuse across a pallas_call, adding an activation round-trip
      per kernel conv on an HBM-bound step. Winning from here would need
      the surrounding GroupNorm+swish absorbed into this kernel, which
      conflicts with banded blocking (GN needs full-frame statistics
      before the first normalized element can feed the conv).
conv3d_impl="pallas"/"mixed" stay parity-tested opt-ins; "auto" resolves
to the measured end-to-end best, tap2dfat.

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

VMEM budget at the worst bench level (128×128 frames, Ci=Co=64→128 lanes,
bf16, bh=32): cur 1 MB ×2 pipelining + halos 2×0.25 MB ×2 + out 1 MB ×2 +
fp32 acc 2 MB + padded strip ~1 MB + weights ≤3.5 MB ≈ 10.5 MB of the
16 MB/core; `_pick_bh` sizes bh per shape against this budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8  # halo band height (rows); finest block granularity worth DMAing


def _lanes(c: int) -> int:
    return -(-c // 128) * 128


def _pick_bh(
    h: int, w: int, ci: int, co: int, itemsize: int, k_group: int = 3
) -> int:
    """Largest 8-multiple divisor of ``h`` whose VMEM footprint (with lane
    padding, double-buffering, and the fp32 accumulator) fits the budget."""
    # The whole (3,3,3,Ci,Co) weight tensor is resident in VMEM; subtract its
    # actual (lane-padded) bytes from the 16 MB/core budget instead of assuming
    # it stays small — at Ci=Co=512 it alone is ~13.5 MB bf16.
    kernel_bytes = 27 * ci * _lanes(co) * itemsize
    budget = 13 * 1024 * 1024 - kernel_bytes

    def est(bh: int) -> int:
        cur = 2 * bh * w * _lanes(ci) * itemsize
        halo = 2 * 2 * _HALO * w * _lanes(ci) * itemsize
        out = 2 * bh * w * _lanes(co) * itemsize
        acc = bh * w * _lanes(co) * 4
        strip = (bh + 2) * (w + 2) * _lanes(ci) * itemsize
        # the im2col operand of the fat-K dots: (bh·w, k_group·Ci)
        # materialized in VMEM (lane padding applies to the concatenated
        # axis as a whole). k_group=9 → one dot per tap but a buffer so
        # large it forces bh=16 at the 128px level (halo amplification
        # 100%); k_group=3 (per-dh) keeps bh=32 (50%).
        xcat = bh * w * _lanes(k_group * ci) * itemsize
        return cur + halo + out + acc + strip + xcat

    cands = [d for d in range(h, 0, -1) if h % d == 0 and d % _HALO == 0]
    if not cands:  # h not a multiple of 8 (tiny test shapes): whole frame
        return h
    for bh in cands:
        if est(bh) <= budget:
            return bh
    return cands[-1]


def _frame(i, kt, t_len):
    """Input frame feeding tap ``kt`` of output frame ``i``: the neighbor
    t+kt-1 within the same clip, clamped at the clip boundary (the clamped
    duplicate fetch is masked off in the kernel)."""
    base = (i // t_len) * t_len
    return base + jnp.clip(i - base + kt - 1, 0, t_len - 1)


def _cur_index(i, hb, kt, *, t_len):
    return (_frame(i, kt, t_len), hb, 0, 0)


def _prev_index(i, hb, kt, *, t_len, hpb):
    # band whose LAST row is row hb*bh - 1 (block hb*hpb - 1), clamped
    return (_frame(i, kt, t_len), jnp.maximum(hb * hpb - 1, 0), 0, 0)


def _next_index(i, hb, kt, *, t_len, hpb, n_halo):
    # band whose FIRST row is row (hb+1)*bh (block (hb+1)*hpb), clamped
    return (
        _frame(i, kt, t_len),
        jnp.minimum((hb + 1) * hpb, n_halo - 1),
        0,
        0,
    )


def _kernel(prev_ref, cur_ref, next_ref, k_ref, o_ref, acc_ref,
            *, t_len: int, n_hb: int, halo_h: int, k_group: int):
    i = pl.program_id(0)
    hb = pl.program_id(1)
    kt = pl.program_id(2)
    tloc = jax.lax.rem(i, t_len)

    @pl.when(kt == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    src = tloc + kt - 1
    valid = jnp.logical_and(src >= 0, src < t_len)

    @pl.when(valid)
    def _accumulate():
        cur = cur_ref[0]  # (bh, W, Ci)
        bh, w, ci = cur.shape
        dt = cur.dtype
        # spatial halo rows, masked to zero at the frame's top/bottom edge
        top = prev_ref[0, halo_h - 1] * (hb > 0).astype(dt)
        bot = next_ref[0, 0] * (hb < n_hb - 1).astype(dt)
        strip = jnp.concatenate([top[None], cur, bot[None]], axis=0)
        xp = jnp.pad(strip, ((0, 0), (1, 1), (0, 0)))
        # MXU-geometry variants, selected by k_group (see _conv3d_pallas):
        # the round-4 form ran nine separate (bh·W, Ci) @ (Ci, Co) dots,
        # whose K=Ci/N=Co geometry fills ≤25% of the MXU at the Ci=Co=64
        # bulk — measured losing end-to-end (181.6 vs 246.3 f/s at
        # 16f/128px) despite moving ~30% less HBM traffic. The lane-dim
        # concat of shifted windows was then thought unlowerable
        # ("result/input offset mismatch on non-concat dimension"); the
        # round-5 probe (tools/probe_mosaic_geometry.py, variant H) showed
        # Mosaic DOES lower exactly this pattern at lane-aligned Ci.
        #   k_group=9: one im2col (bh·W, 9·Ci) @ (9·Ci, Co) dot per tap —
        #              full MXU K rows, but the concat buffer forces bh down
        #              (16 at the 128px level → 100% halo amplification).
        #   k_group=3: per-dh concat, three (bh·W, 3·Ci) @ (3·Ci, Co) dots —
        #              3× the K fill of nine-dot while keeping bh=32 (50%).
        #   k_group=1: nine K=Ci dots — the only form Mosaic lowers at
        #              non-lane-aligned Ci (it rejects both the
        #              (3,3,Ci,Co)→(9·Ci,Co) weight shape cast and sub-lane
        #              concats there); negligible FLOPs at the Ci=3 conv_in.
        if k_group == 9:
            xcat = jnp.concatenate(
                [
                    xp[dh : dh + bh, dw : dw + w, :].reshape(bh * w, -1)
                    for dh in range(3)
                    for dw in range(3)
                ],
                axis=1,
            )
            kmat = k_ref[kt].reshape(-1, k_ref.shape[-1])  # (9·Ci, Co)
            acc_ref[...] += jnp.dot(
                xcat, kmat, preferred_element_type=jnp.float32
            )
        elif k_group == 3:
            for dh in range(3):
                xcat = jnp.concatenate(
                    [
                        xp[dh : dh + bh, dw : dw + w, :].reshape(bh * w, -1)
                        for dw in range(3)
                    ],
                    axis=1,
                )
                kmat = k_ref[kt, dh].reshape(-1, k_ref.shape[-1])
                acc_ref[...] += jnp.dot(
                    xcat, kmat, preferred_element_type=jnp.float32
                )
        else:
            for dh in range(3):
                for dw in range(3):
                    win = xp[dh : dh + bh, dw : dw + w, :].reshape(bh * w, -1)
                    acc_ref[...] += jnp.dot(
                        win, k_ref[kt, dh, dw],
                        preferred_element_type=jnp.float32,
                    )

    @pl.when(kt == 2)
    def _emit():
        bh, w = o_ref.shape[1], o_ref.shape[2]
        o_ref[0] = acc_ref[...].reshape(bh, w, -1).astype(o_ref.dtype)


def _conv3d_pallas(
    x: jax.Array,
    kernel: jax.Array,
    interpret: bool,
    bh: int | None = None,
    k_group: int | None = None,
):
    b, t, h, w, ci = x.shape
    co = kernel.shape[-1]
    if k_group is None:
        # per-dh fat-K (K=3·Ci) for the lane-aligned channel bulk; the
        # nine-dot form only where Mosaic forces it (non-aligned Ci).
        k_group = 3 if ci % 64 == 0 else 1
    if bh is None:  # tests force small bands to exercise the halo path
        bh = _pick_bh(h, w, ci, co, x.dtype.itemsize, k_group)
    assert h % bh == 0, f"band height {bh} must divide frame height {h}"
    n_hb = h // bh
    halo_h = _HALO if bh % _HALO == 0 else bh
    hpb = bh // halo_h
    n_halo = h // halo_h
    xf = x.reshape(b * t, h, w, ci)
    halo_spec = lambda idx: pl.BlockSpec(
        (1, halo_h, w, ci), idx, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, t_len=t, n_hb=n_hb, halo_h=halo_h, k_group=k_group
        ),
        grid=(b * t, n_hb, 3),
        in_specs=[
            halo_spec(functools.partial(_prev_index, t_len=t, hpb=hpb)),
            pl.BlockSpec(
                (1, bh, w, ci),
                functools.partial(_cur_index, t_len=t),
                memory_space=pltpu.VMEM,
            ),
            halo_spec(functools.partial(
                _next_index, t_len=t, hpb=hpb, n_halo=n_halo)),
            # whole (3,3,3,Ci,Co) weight tensor resident in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, w, co), lambda i, hb, kt: (i, hb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * t, h, w, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((bh * w, co), jnp.float32)],
        interpret=interpret,
    )(xf, xf, xf, kernel)
    return out.reshape(b, t, h, w, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_ttap(
    x: jax.Array,
    kernel: jax.Array,
    interpret: bool = False,
    k_group: int | None = None,
) -> jax.Array:
    """Fused-tap 3×3×3 stride-1 SAME Conv3d over NDHWC.

    ``x``: (B, T, H, W, Ci); ``kernel``: (3, 3, 3, Ci, Co) in the compute
    dtype. Zero padding on T/H/W (reference Conv3d semantics). Differentiable;
    see module docstring for the VJP structure. ``k_group`` overrides the
    MXU dot geometry (1/3/9; None = auto) — a bench/test knob.
    """
    return _conv3d_pallas(x, kernel, interpret, k_group=k_group)


def _conv3d_fwd(x, kernel, interpret, k_group):
    return _conv3d_pallas(x, kernel, interpret, k_group=k_group), (x, kernel)


def _conv3d_bwd(interpret, k_group, res, dy):
    x, kernel = res
    # dx: conv of dy with the flipped, Ci/Co-transposed kernel — the same
    # fused-tap Pallas kernel (identity verified in tests against autodiff
    # of the direct XLA conv)
    kf = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _conv3d_pallas(dy, kf, interpret, k_group=k_group)

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
