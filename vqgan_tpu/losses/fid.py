"""Fréchet feature distance for reconstruction quality (rFID-style).

Canonical rFID uses InceptionV3-pool3 features; Inception weights are not
available in this image (zero egress), so this computes the same Fréchet
statistic over our VGG16 relu5_3 features (spatially pooled) — a documented
**proxy**: comparable within this codebase across runs/steps, not directly
comparable to published Inception-based rFID numbers. With imported VGG16
weights (losses/vgg.py converter) it becomes the standard VGG-FD metric.

Fréchet distance between Gaussians fit to feature sets:
  ‖μ₁−μ₂‖² + tr(Σ₁+Σ₂−2·(Σ₁Σ₂)^{1/2})
The matrix sqrt is computed on host via scipy (eval-time only, small C×C).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.losses.vgg import ScalingLayer, VGG16Features


def make_feature_fn(vgg_params, dtype=jnp.float32, taps=(-1,)):
    """Returns jitted fn: (B,H,W,3) in [-1,1] → (B, C) pooled VGG features.

    ``taps`` selects which of the 5 VGG tap activations (relu1_2 … relu5_3)
    are spatially pooled and concatenated. The default (-1,) is the original
    relu5_3-only proxy (C=512); multi-tap (e.g. (2, 3, 4) → C=1280) mixes
    mid-level texture statistics into the Fréchet fit, which measurably
    reduces the small-eval-set artifact where the relu5_3-only proxy rises
    while LPIPS improves (BASELINE.md round-2 dynamics note)."""
    vgg = VGG16Features(dtype=dtype)
    taps = tuple(taps)

    @jax.jit
    def features(x):
        acts = vgg.apply({"params": vgg_params}, ScalingLayer()(x))
        pooled = [acts[i].astype(jnp.float32).mean(axis=(1, 2)) for i in taps]
        return jnp.concatenate(pooled, axis=-1)

    return features


def frechet_distance(
    feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6
) -> float:
    """Fréchet distance between Gaussian fits of two feature sets (N, C)."""
    import scipy.linalg

    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False) + eps * np.eye(feats_a.shape[1])
    s2 = np.cov(feats_b, rowvar=False) + eps * np.eye(feats_b.shape[1])
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(s1 @ s2, disp=False)
    covmean = np.real(covmean)
    return float(diff @ diff + np.trace(s1 + s2 - 2.0 * covmean))


def reconstruction_fid(
    feature_fn, pairs: Iterable[Tuple[np.ndarray, np.ndarray]]
) -> float:
    """rFID proxy over (recon, target) batches in [-1, 1]."""
    fa, fb = [], []
    for recon, target in pairs:
        fa.append(np.asarray(feature_fn(jnp.asarray(recon))))
        fb.append(np.asarray(feature_fn(jnp.asarray(target))))
    return frechet_distance(np.concatenate(fa), np.concatenate(fb))
