"""Ring attention: exact attention over a sequence sharded across chips.

The reference's 3D AttnBlock runs full SDPA over (t·h·w) flattened tokens
(tae.py:26-51) — fine for short clips, quadratic-memory-impossible for long
videos. SURVEY.md §5 names blockwise/ring attention over a ``context`` mesh
axis as the natural TPU extension: each chip holds a contiguous token block;
key/value blocks rotate around the ICI ring via ``lax.ppermute`` while a
flash-style online softmax accumulates, so

  - memory per chip is O(N_local · N_local) per ring step, never O(N²),
  - the k/v transfer for step i+1 overlaps the attention compute of step i
    (XLA schedules the ppermute alongside the matmuls),
  - the result is EXACT full attention (softmax is order-independent over
    key blocks), verified against ``jax.nn.dot_product_attention`` in
    tests/test_ops.py.

``ring_attention`` runs *inside* ``shard_map``; ``AttnBlock3D`` wraps it
over the mesh's context axis when constructed with ``mesh``/``ring_axis``
(models/tae.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str
) -> jax.Array:
    """Exact attention with k/v blocks rotating around ``axis_name``.

    Args (all local shards, inside shard_map):
      q, k, v: (B, N_local, H, D)
    Returns:
      (B, N_local, H, D), same dtype as q; softmax accumulates in fp32.
    """
    n_shards = lax.axis_size(axis_name)
    in_dtype = q.dtype
    b, n_loc, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qf = q.astype(jnp.float32) * scale
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

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
    out = o / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(in_dtype)  # (B, Nq, H, D)
