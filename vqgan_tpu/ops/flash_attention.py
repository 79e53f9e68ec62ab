"""TPU Pallas flash attention for the long-clip mid-block path.

Round-2 trace evidence (docs/perf/trace_tvae_longclip_r02.txt): the lax.scan
chunked-attention formulation spends 38.2% of the 48f/256px step in the chunk
loop at 0.2 TFLOP/s — each scan iteration round-trips a (B, H, N, chunk) fp32
score tensor through HBM (~1.6 GB at N=49152, chunk=1024), so the step is
HBM-bound a hundredfold below the MXU's reach. A flash kernel keeps the
per-tile scores in VMEM for their whole life; the only HBM traffic is q/k/v/o
plus the O(N) softmax statistics.

This module wraps the Pallas TPU flash-attention kernel that ships with JAX
(jax.experimental.pallas.ops.tpu.flash_attention — forward AND backward
kernels, exact online softmax, custom VJP) behind the framework's
(B, N, H, D) layout and block-size selection tuned for the TVAE geometry
(8 heads, head_dim = C/8; reference tae.py:13-54 runs this attention dense).
The lax chunked formulation (ops/chunked_attention.py) remains the portable
path: CPU tests, jax.export serving artifacts, and token counts that cannot
be tiled to the kernel's 128-multiple block grid.

Numerics: both paths are exact attention; parity is pinned in
tests/test_ops.py (interpret-mode Pallas vs dense on CPU, and on real TPU in
the hardware suite). The kernel accumulates softmax statistics in fp32
regardless of input dtype, like the lax path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Kernel tile caps, swept on a v5e at the long-clip geometry (N=49152, 8
# heads, head_dim 32; tools/bench_flash_attention.py --sweep, BASELINE.md):
# 1024-tiles win the backward (307.8 ms fwd+bwd vs 321.5 at 512 and 1814 at
# the kernel-default 128) — larger k tiles amortize the head_dim-32 MXU
# underfill over longer contractions in the p@v / ds@k matmuls. Score tiles
# are (1024, 1024) fp32 = 4 MB VMEM, fine for the TVAE's head_dim ≤ 64.
# Caps are lowered to the largest 128-multiple divisor of the token count.
_BLOCK_Q_CAP = 1024
_BLOCK_K_CAP = 1024
_BLOCK_K_MAJOR_CAP = 1024


def _largest_tile(n: int, cap: int) -> int | None:
    """Largest multiple of 128 that divides ``n`` and is ≤ ``cap``."""
    t = min(cap, n)
    t -= t % 128
    while t >= 128:
        if n % t == 0:
            return t
        t -= 128
    return None


def supports_flash(n_tokens: int) -> bool:
    """Whether the Pallas kernel can tile this token count (128-multiple)."""
    return n_tokens % 128 == 0


@functools.lru_cache(maxsize=None)
def _block_sizes(n_tokens: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = _largest_tile(n_tokens, _BLOCK_Q_CAP)
    bk = _largest_tile(n_tokens, _BLOCK_K_CAP)
    bkm = _largest_tile(n_tokens, _BLOCK_K_MAJOR_CAP)
    if bq is None or bk is None or bkm is None:
        raise ValueError(
            f"token count {n_tokens} is not tileable by the flash kernel "
            f"(needs a multiple of 128)"
        )
    if bkm % bk:
        bkm = bk
    return BlockSizes(
        block_q=bq,
        block_k_major=bkm,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bkm,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bkm,
        block_k_dq=bk,
        block_q_dq=bq,
    )


def flash_attention_tpu(
    q: jax.Array, k: jax.Array, v: jax.Array
) -> jax.Array:
    """Exact attention over (B, N, H, D) tensors via the Pallas TPU kernel.

    ``N`` must be a multiple of 128 (``supports_flash``). Differentiable —
    the backward runs the kernel's dq/dkv Pallas passes, with the same
    O(N·D) residuals (out + logsumexp) as ops/chunked_attention.py.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    b, n, h, d = q.shape
    sm_scale = float(d) ** -0.5
    # kernel layout is (B, H, N, D)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _fa.flash_attention(
        qt, kt, vt,
        causal=False,
        sm_scale=sm_scale,
        block_sizes=_block_sizes(n),
    )
    return out.transpose(0, 2, 1, 3)


def memory_efficient_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    chunk_size: int,
    impl: str = "auto",
) -> jax.Array:
    """O(N·tile)-memory exact attention over (B, N, H, D).

    ``impl``:
      - "auto": Pallas flash kernel when the process backend is TPU and the
        token count tiles; lax chunked scan otherwise.
      - "pallas": force the Pallas kernel (errors off-TPU / untileable N).
      - "lax": force the portable chunked scan — required for jax.export
        artifacts (a baked Pallas call is TPU-only) and CPU runs.

    Both implementations are exact; ``chunk_size`` is the lax path's k/v
    chunk (the Pallas kernel picks its own tiles).
    """
    if impl not in ("auto", "pallas", "lax"):
        raise ValueError(f"unknown attention impl {impl!r}")
    n = q.shape[1]
    if impl == "auto":
        impl = (
            "pallas"
            if jax.default_backend() == "tpu" and supports_flash(n)
            else "lax"
        )
    if impl == "pallas":
        return flash_attention_tpu(q, k, v)
    from vqgan_tpu.ops.chunked_attention import chunked_attention

    return chunked_attention(q, k, v, chunk_size)
