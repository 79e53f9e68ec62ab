"""Single-chip exact chunked (flash-style) attention: O(N·chunk) memory.

Why: the 3D AttnBlock runs full SDPA over (t·h·w) flattened tokens
(reference tae.py:26-51). For long clips on ONE chip the score matrix is
the memory wall, not conv activations — a 48-frame 256px clip has 49152
mid-block tokens, and XLA's dense SDPA materializes an fp32
(B, H, 49152, 49152) score tensor (~77 GB, measured OOM in BASELINE.md).
Ring attention (ops/ring_attention.py) solves this across chips; this is
the single-chip counterpart: scan over key/value chunks with an online
softmax, never holding more than (B, H, N, chunk) scores.

The backward is a custom VJP implementing the standard flash-attention
derivation — residuals are q, k, v, out and the per-query logsumexp
(all O(N·D)), and scores are RECOMPUTED per chunk; a plain lax.scan
backward would stack per-step probability residuals and reinstate the
O(N²) it was meant to remove.

Exact (not approximate): the online softmax is order-independent over key
chunks; forward+grad parity vs dense SDPA is pinned in tests/test_ops.py.

A Pallas TPU kernel of the same algorithm ships with JAX
(jax.experimental.pallas.ops.tpu.flash_attention) — this lax formulation
is platform-portable (CPU tests, jax.export serving artifacts) and lets
XLA fuse the chunk loop; swap in the Pallas kernel if profiling ever shows
the chunk loop itself on the critical path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _split_chunks(x: jax.Array, chunk: int) -> jax.Array:
    """(B, N, H, D) → (nc, B, C, H, D) scan-ready chunk stack."""
    b, n, h, d = x.shape
    return x.reshape(b, n // chunk, chunk, h, d).transpose(1, 0, 2, 3, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def chunked_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, chunk_size: int
) -> jax.Array:
    """Exact attention over (B, N, H, D) tensors, scanning k/v in chunks.

    ``N`` must divide by ``chunk_size``. Softmax statistics accumulate in
    fp32; output dtype follows q. Peak score memory is (B, H, N, chunk).
    """
    out, _ = _forward(q, k, v, chunk_size)
    return out


def _forward(q, k, v, chunk_size):
    in_dtype = q.dtype
    b, n, h, d = q.shape
    if n % chunk_size:
        raise ValueError(
            f"chunk_size {chunk_size} must divide the token count {n}"
        )
    scale = d ** -0.5
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3) * scale  # (B,H,N,D)
    kc = _split_chunks(k.astype(jnp.float32), chunk_size)
    vc = _split_chunks(v.astype(jnp.float32), chunk_size)

    def step(carry, kv):
        o, m, l = carry
        kb, vb = kv  # (B, C, H, D)
        s = jnp.einsum("bhqd,bchd->bhqc", qf, kb)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum("bhqc,bchd->bhqd", p, vb)
        return (o, m_new, l), None

    o0 = jnp.zeros_like(qf)
    m0 = jnp.full(qf.shape[:-1], -jnp.inf, jnp.float32)
    l0 = jnp.zeros(qf.shape[:-1], jnp.float32)
    (o, m, l), _ = lax.scan(step, (o0, m0, l0), (kc, vc))
    out = (o / l[..., None]).transpose(0, 2, 1, 3).astype(in_dtype)
    lse = m + jnp.log(l)  # per-query logsumexp, the backward's residual
    return out, lse


def _fwd_rule(q, k, v, chunk_size):
    out, lse = _forward(q, k, v, chunk_size)
    return out, (q, k, v, out, lse)


def _bwd_rule(chunk_size, res, g):
    q, k, v, out, lse = res
    b, n, h, d = q.shape
    scale = d ** -0.5
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)   # (B,H,N,D), unscaled
    do = g.astype(jnp.float32).transpose(0, 2, 1, 3)
    of = out.astype(jnp.float32).transpose(0, 2, 1, 3)
    delta = (do * of).sum(axis=-1)                      # (B,H,N)
    kc = _split_chunks(k.astype(jnp.float32), chunk_size)
    vc = _split_chunks(v.astype(jnp.float32), chunk_size)

    def step(dq, kv):
        kb, vb = kv
        s = jnp.einsum("bhqd,bchd->bhqc", qf, kb) * scale
        p = jnp.exp(s - lse[..., None])                 # exact probabilities
        dv = jnp.einsum("bhqc,bhqd->bchd", p, do)
        dp = jnp.einsum("bhqd,bchd->bhqc", do, vb)
        ds = p * (dp - delta[..., None]) * scale
        dq = dq + jnp.einsum("bhqc,bchd->bhqd", ds, kb)
        dk = jnp.einsum("bhqc,bhqd->bchd", ds, qf)
        return dq, (dk, dv)

    dq0 = jnp.zeros_like(qf)
    dq, (dks, dvs) = lax.scan(step, dq0, (kc, vc))

    def _merge(chunks):  # (nc, B, C, H, D) → (B, N, H, D)
        return chunks.transpose(1, 0, 2, 3, 4).reshape(b, n, h, d)

    return (
        dq.transpose(0, 2, 1, 3).astype(q.dtype),
        _merge(dks).astype(k.dtype),
        _merge(dvs).astype(v.dtype),
    )


chunked_attention.defvjp(_fwd_rule, _bwd_rule)
