"""VQ layer unit tests: STE gradients, EMA statistics, dead-code revival."""

import numpy as np

import jax
import jax.numpy as jnp

from vqgan_tpu.models.quant import (
    VectorQuantizer,
    apply_ema_codebook_update,
    revive_dead_codes,
)


def _init(K=16, D=4, ema=0.0):
    vq = VectorQuantizer(codebook_size=K, embedding_dim=D, ema_decay=ema)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 3, D))
    variables = vq.init(jax.random.PRNGKey(1), z)
    return vq, variables, z


def test_ste_passes_gradient_through():
    vq, variables, z = _init()

    def loss(z):
        zq, aux = vq.apply(variables, z)
        return jnp.sum(jnp.square(zq))

    g = jax.grad(loss)(z)
    zq, _ = vq.apply(variables, z)
    # STE: d/dz sum(zq²) == 2·zq exactly
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(zq), rtol=1e-5)


def test_vq_losses_and_codes():
    vq, variables, z = _init()
    zq, aux = vq.apply(variables, z)
    assert aux["codes"].shape == (2, 3, 3)
    assert float(aux["vq_loss"]) > 0
    assert 1.0 <= float(aux["perplexity"]) <= 16.0
    # quantized vectors are codebook rows
    cb = variables["params"]["codebook"]
    flat_codes = np.asarray(aux["codes"]).reshape(-1)
    expected = np.asarray(cb)[flat_codes].reshape(np.asarray(zq).shape)
    # zq = z + sg(q - z) → value equals q
    np.testing.assert_allclose(np.asarray(zq), expected, rtol=1e-5)


def test_ema_updates_move_stats():
    vq, variables, z = _init(ema=0.5)
    _, state = vq.apply(variables, z, mutable=["vq_ema"])
    counts = np.asarray(state["vq_ema"]["counts"])
    assert counts.sum() > 0
    new_params = apply_ema_codebook_update(
        variables["params"], jax.device_get(state["vq_ema"])
    )
    assert new_params["codebook"].shape == variables["params"]["codebook"].shape


def test_revive_dead_codes():
    K, D = 8, 4
    codebook = jnp.zeros((K, D))
    counts = jnp.array([10.0, 0.1, 10.0, 0.0, 10.0, 10.0, 0.5, 10.0])
    z_samples = jnp.ones((32, D)) * 7.0
    out = revive_dead_codes(codebook, counts, z_samples, jax.random.PRNGKey(0))
    out = np.asarray(out)
    dead = [1, 3, 6]
    alive = [0, 2, 4, 5, 7]
    for i in dead:
        np.testing.assert_allclose(out[i], 7.0)
    for i in alive:
        np.testing.assert_allclose(out[i], 0.0)
