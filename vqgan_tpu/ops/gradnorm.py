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

Scale note: for N iid shards, the global Frobenius norm is ≈ √N × the
average of per-shard norms, so the pjit path scales each branch's gradient a
constant √N smaller than the reference's convention. Both are "fixed-scale"
balancing — the constant folds into the learning rate — but when matching
reference loss curves chip-count-for-GPU-count, account for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gradnorm(x: jax.Array, weight: float = 1.0, axis_name: str | None = None):
    """Identity forward; backward rescales grad to norm ``weight``."""
    del weight, axis_name
    return x


def _gradnorm_fwd(x, weight, axis_name):
    del weight, axis_name
    return x, None


def _gradnorm_bwd(weight, axis_name, _res, g):
    gf = g.astype(jnp.float32)
    # Frobenius norm of the full (global) cotangent — reference
    # vae_trainer.py:40 uses torch.norm over the whole tensor.
    norm = jnp.sqrt(jnp.sum(jnp.square(gf)))
    if axis_name is not None:
        norm = jax.lax.pmean(norm, axis_name)
    out = (weight * gf / (norm + 1e-8)).astype(g.dtype)
    return (out,)


gradnorm.defvjp(_gradnorm_fwd, _gradnorm_bwd)
