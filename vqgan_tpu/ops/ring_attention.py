"""Ring attention: exact attention over a sequence sharded across chips.

The reference's 3D AttnBlock runs full SDPA over (t·h·w) flattened tokens
(tae.py:26-51) — fine for short clips, quadratic-memory-impossible for long
videos. SURVEY.md §5 names blockwise/ring attention over a ``context`` mesh
axis as the natural TPU extension: each chip holds a contiguous token block;
key/value blocks rotate around the ICI ring via ``lax.ppermute`` while a
flash-style online softmax accumulates, so

  - memory per chip is O(N_loc · N_loc) per ring step, never O(N²),
  - the k/v transfer for step i+1 overlaps the attention compute of step i
    (XLA schedules the ppermute alongside the matmuls),
  - the result is EXACT full attention (softmax is order-independent over
    key blocks), verified against ``jax.nn.dot_product_attention`` in
    tests/test_ops.py.

The backward is a custom VJP in the same flash style as
ops/chunked_attention.py: residuals are q, k, v, out and the per-query
logsumexp (all O(N_loc·D) per chip); scores are RECOMPUTED per ring step
from the saved logsumexp. Differentiating through the forward scan instead
would stack each step's (B, H, N_loc, N_loc) probability block plus the
rotated k/v as residuals — O(N_loc·N) per chip, exactly the memory wall the
ring exists to remove. dk/dv accumulate on buffers that ROTATE WITH their
k/v blocks: after a full ring cycle each gradient block arrives back at its
home chip, so no all-to-all is needed.

``ring_attention`` runs *inside* ``shard_map``; ``AttnBlock3D`` wraps it
over the mesh's context axis when constructed with ``mesh``/``ring_axis``
(models/tae.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _ring_perm(n_shards: int):
    return [(i, (i + 1) % n_shards) for i in range(n_shards)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str
) -> jax.Array:
    """Exact attention with k/v blocks rotating around ``axis_name``.

    Args (all local shards, inside shard_map):
      q, k, v: (B, N_local, H, D)
    Returns:
      (B, N_local, H, D), same dtype as q; softmax accumulates in fp32.
    """
    out, _ = _forward(q, k, v, axis_name)
    return out


def _forward(q, k, v, axis_name):
    n_shards = lax.axis_size(axis_name)
    in_dtype = q.dtype
    b, n_loc, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qf = q.astype(jnp.float32) * scale
    perm = _ring_perm(n_shards)

    def accumulate(o, m, l, kb, vb):
        # scores for this key block: (B, H, Nq, Nk)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kb.astype(jnp.float32))
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, vb.astype(jnp.float32)
        )
        return o, m_new, l

    def step(carry, _):
        o, m, l, kb, vb = carry
        o, m, l = accumulate(o, m, l, kb, vb)
        # rotate k/v to the next ring position; XLA overlaps this ICI
        # transfer with the next step's matmuls
        kb = lax.ppermute(kb, axis_name, perm)
        vb = lax.ppermute(vb, axis_name, perm)
        return (o, m, l, kb, vb), None

    # shard_map's varying-manual-axes typing requires the initial carry to
    # vary over the same mesh axes as the scan outputs; deriving the zeros
    # from q inherits exactly the input's varying axes (ring axis + any
    # data axes the batch is sharded over), unlike fresh constants
    zq = 0.0 * qf.transpose(0, 2, 1, 3)  # (B, H, Nq, D), varying like q
    o0 = zq
    m0 = zq[..., 0] - jnp.inf
    l0 = zq[..., 0]
    # n_shards-1 accumulate+rotate rounds, then one final accumulate with no
    # rotation — the last ppermute's result would be discarded, and on real
    # hardware each skipped rotation saves a full k/v block transfer per ring
    (o, m, l, kb, vb), _ = lax.scan(
        step, (o0, m0, l0, k, v), None, length=n_shards - 1
    )
    o, m, l = accumulate(o, m, l, kb, vb)
    out = (o / l[..., None]).transpose(0, 2, 1, 3).astype(in_dtype)
    lse = m + jnp.log(l)  # (B, H, Nq) per-query logsumexp of scaled scores
    return out, lse


def _fwd_rule(q, k, v, axis_name):
    out, lse = _forward(q, k, v, axis_name)
    return out, (q, k, v, out, lse)


def _bwd_rule(axis_name, res, g):
    q, k, v, out, lse = res
    n_shards = lax.axis_size(axis_name)
    b, n_loc, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    perm = _ring_perm(n_shards)

    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)   # (B,H,Nq,D), unscaled
    do = g.astype(jnp.float32).transpose(0, 2, 1, 3)
    of = out.astype(jnp.float32).transpose(0, 2, 1, 3)
    delta = (do * of).sum(axis=-1)                      # (B,H,Nq)

    def step(carry, _):
        kb, vb, dkb, dvb, dq = carry
        kf = kb.astype(jnp.float32)                     # (B,Nk,H,D)
        vf = vb.astype(jnp.float32)
        # exact probabilities from the saved logsumexp — no online pass
        s = jnp.einsum("bhqd,bkhd->bhqk", qf, kf) * scale
        p = jnp.exp(s - lse[..., None])                 # (B,H,Nq,Nk)
        dvb = dvb + jnp.einsum("bhqk,bhqd->bkhd", p, do)
        dp = jnp.einsum("bhqd,bkhd->bhqk", do, vf)
        ds = p * (dp - delta[..., None]) * scale
        dq = dq + jnp.einsum("bhqk,bkhd->bhqd", ds, kf)
        dkb = dkb + jnp.einsum("bhqk,bhqd->bkhd", ds, qf)
        # dk/dv ride the ring WITH their blocks; after the full cycle each
        # accumulated gradient block is back at its home chip
        kb = lax.ppermute(kb, axis_name, perm)
        vb = lax.ppermute(vb, axis_name, perm)
        dkb = lax.ppermute(dkb, axis_name, perm)
        dvb = lax.ppermute(dvb, axis_name, perm)
        return (kb, vb, dkb, dvb, dq), None

    zkv = 0.0 * k.astype(jnp.float32)                   # varying like k
    dq0 = 0.0 * qf
    (kb, vb, dk, dv, dq), _ = lax.scan(
        step, (k, v, zkv, zkv, dq0), None, length=n_shards
    )
    return (
        dq.transpose(0, 2, 1, 3).astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
    )


ring_attention.defvjp(_fwd_rule, _bwd_rule)
