"""Gradient-normalization loss balancing as a ``jax.custom_vjp``.

The reference implements this as a torch autograd.Function whose backward
divides the incoming gradient by its cross-rank-averaged norm and multiplies
by a per-branch weight (GradNormFunction, vae_trainer.py:27-53); it is applied
to the reconstruction once per loss branch (LPIPS w=1.0, MSE w=0.001, GAN
w=1.0; vae_trainer.py:662,679,683) so each branch contributes a fixed-scale
gradient regardless of its raw magnitude (README.md:25-54).

TPU-native redesign: under pjit/jit with global-batch semantics the tensor is
logically global, so ``jnp.linalg.norm`` over it *is* the cross-chip norm —
XLA inserts the partial-sum all-reduce over ICI automatically; no explicit
collective is needed (the reference's ``dist.all_reduce`` becomes implicit).
For use inside ``shard_map``/``pmap`` bodies, pass ``axis_name`` and the norm
is averaged with ``lax.pmean``, matching the reference's average-of-rank-norms
exactly.

Scale modes. For N iid shards, the global Frobenius norm is ≈ √N × the
average of per-shard norms, so the default global-norm path scales each
branch's gradient a constant √N smaller than the reference's convention (both
are "fixed-scale" balancing; the constant folds into the learning rate).
``shards=N`` reproduces the reference EXACTLY under pjit without any
shard_map: the data-parallel batch sharding slices dim 0 into N contiguous
equal blocks, so grouping per-example squared sums into those N blocks gives
precisely the per-rank norms the reference all-reduce-averages
(vae_trainer.py:40-44) — and because gradnorm divides by the norm, the 1/N
loss-scale difference between "mean over the global batch" (ours) and "mean
over the local batch" (torch DDP per rank) cancels, making the post-gradnorm
gradient bit-equivalent in exact arithmetic (pinned by
tests/test_ops.py::test_gradnorm_mean_shard_norm_matches_reference).
Select with ``TrainConfig.gradnorm_mode = "mean_shard_norm"``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def gradnorm(
    x: jax.Array,
    weight: float = 1.0,
    axis_name: str | None = None,
    shards: int = 1,
):
    """Identity forward; backward rescales grad to norm ``weight``.

    ``shards > 1``: normalize by the MEAN of the ``shards`` per-block norms
    over contiguous dim-0 blocks (reference per-rank semantics for a batch
    sharded that way) instead of the global Frobenius norm.
    """
    del weight, axis_name, shards
    return x


def _gradnorm_fwd(x, weight, axis_name, shards):
    del weight, axis_name, shards
    return x, None


def _gradnorm_bwd(weight, axis_name, shards, _res, g):
    gf = g.astype(jnp.float32)
    if shards > 1:
        b = gf.shape[0]
        if b % shards:
            raise ValueError(
                f"gradnorm shards {shards} must divide the batch {b}"
            )
        # per-example squared sums → contiguous per-shard norms → mean:
        # exactly the reference's all_reduce(AVG) over per-rank norms
        # (vae_trainer.py:40-44) for a dim-0-sharded batch
        sq = jnp.sum(jnp.square(gf).reshape(b, -1), axis=1)
        norm = jnp.mean(jnp.sqrt(sq.reshape(shards, b // shards).sum(axis=1)))
    else:
        # Frobenius norm of the full (global) cotangent — reference
        # vae_trainer.py:40 uses torch.norm over the whole tensor.
        norm = jnp.sqrt(jnp.sum(jnp.square(gf)))
    if axis_name is not None:
        norm = jax.lax.pmean(norm, axis_name)
    out = (weight * gf / (norm + 1e-8)).astype(g.dtype)
    return (out,)


gradnorm.defvjp(_gradnorm_fwd, _gradnorm_bwd)
