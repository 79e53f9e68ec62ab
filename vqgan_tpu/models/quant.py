"""Vector-quantized latent layer (codebook + straight-through estimator).

The reference snapshot contains no VQ despite its repo name (SURVEY.md §0);
the driver's BASELINE.json declares a VQ variant as a capability target
(config #4: "vector-quantization codebook with straight-through estimator").
This is a TPU-first implementation:

  - nearest-code search as one big matmul on the MXU: ‖z‖² − 2·z·Eᵀ + ‖E‖²
    with argmin over the codebook axis (no gather-heavy pairwise distances),
  - straight-through estimator z + sg(z_q − z),
  - commitment loss β·‖z − sg(e)‖² + codebook loss ‖sg(z) − e‖²,
  - optional EMA codebook updates (sums computed with one-hot matmuls —
    scatter-free, MXU-friendly; cluster counts psum automatically under
    global-batch pjit semantics),
  - perplexity / codebook-usage telemetry.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqgan_tpu.ops.pallas.vq import code_stats, nearest_codes


class VectorQuantizer(nn.Module):
    codebook_size: int = 16384
    embedding_dim: int = 16
    beta: float = 0.25
    ema_decay: float = 0.99  # 0 disables EMA updates (loss-only codebook)
    ema_eps: float = 1e-5
    # codebook-search implementation: "auto" routes to the fused Pallas
    # kernel (ops/pallas/vq.py) on a TPU backend when K is 128-tileable —
    # it never materializes the (N, K) distance/one-hot matrices the XLA
    # formulation round-trips through HBM; "xla"/"pallas" force a path.
    impl: str = "auto"

    @nn.compact
    def __call__(
        self, z: jax.Array, update_stats: bool = True
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """z: (..., D) → (z_q with STE, aux dict).

        When EMA is enabled, updated codebook statistics are exposed in the
        "vq_ema" mutable collection (pass ``update_stats=False`` for eval
        applies where the collection is immutable); the train step folds them
        into the codebook functionally (apply_ema_codebook_update).
        """
        d = z.shape[-1]
        assert d == self.embedding_dim, (d, self.embedding_dim)
        codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.codebook_size, d),
            jnp.float32,
        )
        zf = z.astype(jnp.float32)
        flat = zf.reshape(-1, d)  # (N, D)
        # nearest-code search: one big matmul on the MXU (no gather-heavy
        # pairwise distances); on TPU the fused Pallas kernel keeps the
        # (N, K) distances in VMEM for their whole life (ops/pallas/vq.py)
        codes = nearest_codes(flat, codebook, impl=self.impl)  # (N,)
        z_q_flat = jnp.take(codebook, codes, axis=0)  # (N, D)
        z_q = z_q_flat.reshape(zf.shape)

        commitment = jnp.mean(jnp.square(zf - jax.lax.stop_gradient(z_q)))
        codebook_loss = jnp.mean(jnp.square(jax.lax.stop_gradient(zf) - z_q))
        # with EMA updates the codebook is not trained by gradient — only the
        # commitment term remains in the loss
        if self.ema_decay > 0:
            vq_loss = self.beta * commitment
        else:
            vq_loss = codebook_loss + self.beta * commitment

        # per-code counts (+ code-wise sums when the EMA update will consume
        # them): scatter-free; on TPU the Pallas stats kernel accumulates
        # them tile-wise without ever forming the (N, K) one-hot
        need_sums = bool(
            self.ema_decay > 0 and not self.is_initializing() and update_stats
        )
        counts, sums = code_stats(
            codes, flat, self.codebook_size, with_sums=need_sums,
            impl=self.impl,
        )
        probs = counts / jnp.maximum(jnp.sum(counts), 1.0)
        perplexity = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))

        if self.ema_decay > 0:
            # EMA statistics (scatter-free): code counts and code-wise sums
            ema_counts = self.variable(
                "vq_ema", "counts", lambda: jnp.ones((self.codebook_size,), jnp.float32)
            )
            ema_sums = self.variable(
                "vq_ema", "sums", lambda: jnp.array(codebook, jnp.float32)
            )
            if not self.is_initializing() and update_stats:
                new_counts = self.ema_decay * ema_counts.value + (
                    1 - self.ema_decay
                ) * counts
                new_sums = self.ema_decay * ema_sums.value + (1 - self.ema_decay) * sums
                ema_counts.value = new_counts
                ema_sums.value = new_sums

        # straight-through estimator
        z_q_ste = zf + jax.lax.stop_gradient(z_q - zf)
        aux = {
            "vq_loss": vq_loss,
            "commitment_loss": commitment,
            "codebook_loss": codebook_loss,
            "perplexity": perplexity,
            "codes": codes.reshape(zf.shape[:-1]),
            "usage": jnp.mean((counts > 0).astype(jnp.float32)),
        }
        return z_q_ste.astype(z.dtype), aux


def revive_dead_codes(
    codebook: "jax.Array",
    counts: "jax.Array",
    z_samples: "jax.Array",
    rng: "jax.Array",
    threshold: float = 1.0,
) -> "jax.Array":
    """Reseed rarely-used codes from random encoder outputs — the standard
    fix for codebook collapse, required to keep large codebooks utilized
    (cf. the ~99%-utilization result for 100k codebooks, PAPERS.md).

    ``z_samples``: (N, D) flat encoder outputs from the current batch.
    Codes with EMA count < threshold are replaced by random samples.
    """
    k = codebook.shape[0]
    idx = jax.random.randint(rng, (k,), 0, z_samples.shape[0])
    replacements = jnp.take(z_samples, idx, axis=0)
    dead = (counts < threshold)[:, None]
    return jnp.where(dead, replacements, codebook)


def apply_ema_codebook_update(
    params: dict, ema_state: dict, eps: float = 1e-5
) -> dict:
    """Functionally fold EMA statistics into the codebook parameter:
    codebook_k = sums_k / (counts_k + eps), with Laplace-smoothed counts."""
    counts = ema_state["counts"]
    sums = ema_state["sums"]
    n = jnp.sum(counts)
    smoothed = (counts + eps) / (n + counts.shape[0] * eps) * n
    new_codebook = sums / smoothed[:, None]
    out = dict(params)
    out["codebook"] = new_codebook
    return out
