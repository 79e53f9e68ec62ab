"""Pallas VQ kernel parity (interpret mode on CPU): nearest-code search and
code statistics vs the XLA formulations of models/quant.py.

Hardware execution of the same kernels is covered by the TPU-gated test in
tests/test_hardware_kernels.py-style suites; here interpret mode pins the
kernel logic (tiling, padding, argmin tie semantics, stats accumulation).
"""

import numpy as np

import jax
import jax.numpy as jnp

from vqgan_tpu.models.quant import VectorQuantizer, apply_ema_codebook_update
from vqgan_tpu.ops.pallas.vq import (
    code_stats,
    nearest_codes,
    supports_vq_kernel,
)


def _data(n=700, k=256, d=16, seed=0):
    kz, kc = jax.random.split(jax.random.PRNGKey(seed))
    z = jax.random.normal(kz, (n, d), jnp.float32)
    cb = jax.random.normal(kc, (k, d), jnp.float32)
    return z, cb


def test_supports_vq_kernel():
    assert supports_vq_kernel(16384)
    assert supports_vq_kernel(256)
    assert not supports_vq_kernel(100)
    assert not supports_vq_kernel(16)


def test_nearest_codes_pallas_matches_xla():
    # n=700 exercises the N-tile padding (pads to 1024, two grid steps)
    z, cb = _data(n=700, k=256)
    ref = nearest_codes(z, cb, impl="xla")
    got = nearest_codes(z, cb, impl="pallas")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_nearest_codes_pallas_wide_codebook_multi_ktile():
    # K=2048 > the 1024 K-tile → exercises the in-kernel K fori_loop merge
    z, cb = _data(n=512, k=2048, d=8, seed=3)
    ref = nearest_codes(z, cb, impl="xla")
    got = nearest_codes(z, cb, impl="pallas")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_nearest_codes_tie_prefers_first_index():
    # duplicate codebook rows: argmin must return the first occurrence,
    # matching jnp.argmin (including across K tiles)
    z = jnp.asarray(np.random.RandomState(0).randn(64, 4), jnp.float32)
    base = jnp.asarray(np.random.RandomState(1).randn(128, 4), jnp.float32)
    cb = jnp.concatenate([base, base], axis=0)  # every code duplicated
    ref = nearest_codes(z, cb, impl="xla")
    got = nearest_codes(z, cb, impl="pallas")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(jnp.max(got)) < 128  # first copy wins


def test_code_stats_pallas_matches_onehot():
    z, cb = _data(n=700, k=256)
    codes = nearest_codes(z, cb, impl="xla")
    ref_counts, ref_sums = code_stats(
        codes, z, 256, with_sums=True, impl="xla"
    )
    got_counts, got_sums = code_stats(
        codes, z, 256, with_sums=True, impl="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(got_counts), np.asarray(ref_counts), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(got_sums), np.asarray(ref_sums), rtol=1e-6, atol=1e-5
    )
    assert float(jnp.sum(got_counts)) == 700.0  # padded rows count nowhere


def test_code_stats_counts_only():
    z, cb = _data(n=512, k=128, d=4, seed=7)
    codes = nearest_codes(z, cb, impl="xla")
    counts, sums = code_stats(codes, z, 128, with_sums=False, impl="pallas")
    ref_counts, _ = code_stats(codes, z, 128, with_sums=False, impl="xla")
    assert sums is None
    np.testing.assert_allclose(np.asarray(counts), np.asarray(ref_counts))


def test_quantizer_pallas_impl_matches_xla():
    d = 16
    vq_x = VectorQuantizer(codebook_size=256, embedding_dim=d, ema_decay=0.0, impl="xla")
    vq_p = VectorQuantizer(codebook_size=256, embedding_dim=d, ema_decay=0.0, impl="pallas")
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, d))
    variables = vq_x.init(jax.random.PRNGKey(1), z)
    zq_x, aux_x = vq_x.apply(variables, z)
    zq_p, aux_p = vq_p.apply(variables, z)
    np.testing.assert_array_equal(np.asarray(aux_p["codes"]), np.asarray(aux_x["codes"]))
    np.testing.assert_allclose(np.asarray(zq_p), np.asarray(zq_x), rtol=1e-6)
    np.testing.assert_allclose(
        float(aux_p["perplexity"]), float(aux_x["perplexity"]), rtol=1e-5
    )


def test_quantizer_pallas_ema_updates_match_xla():
    d = 8
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 6, d))
    outs = {}
    for impl in ("xla", "pallas"):
        vq = VectorQuantizer(
            codebook_size=128, embedding_dim=d, ema_decay=0.9, impl=impl
        )
        variables = vq.init(jax.random.PRNGKey(1), z)
        (_, _), mut = vq.apply(variables, z, mutable=["vq_ema"])
        params = apply_ema_codebook_update(
            variables["params"], mut["vq_ema"]
        )
        outs[impl] = (mut["vq_ema"], params["codebook"])
    for key in ("counts", "sums"):
        np.testing.assert_allclose(
            np.asarray(outs["pallas"][0][key]),
            np.asarray(outs["xla"][0][key]),
            rtol=1e-5,
            atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(outs["pallas"][1]), np.asarray(outs["xla"][1]), rtol=1e-5
    )


def test_quantizer_auto_impl_on_cpu_routes_to_xla():
    # on the CPU test backend "auto" must take the XLA path (no interpret
    # overhead in the trainer tests) and agree with the explicit XLA impl
    d = 4
    vq = VectorQuantizer(codebook_size=16, embedding_dim=d)  # K not tileable
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 3, d))
    variables = vq.init(jax.random.PRNGKey(1), z)
    zq, aux = vq.apply(variables, z, update_stats=False)
    assert aux["codes"].shape == (2, 3, 3)
    assert bool(jnp.isfinite(zq).all())
