"""Hardware-only tests — skipped on the CPU test backend, run when pytest
executes against a real TPU (the checks the driver/bench exercise manually
in this container, kept as tests for a future on-chip CI).

The CPU suite covers the same numerics through interpret mode
(tests/test_ops.py::test_flash_attention_pallas_matches_dense); this file
asserts the COMPILED Mosaic kernels agree with the lax path on the chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


@requires_tpu
def test_flash_attention_compiled_matches_lax_on_tpu():
    from vqgan_tpu.ops.chunked_attention import chunked_attention
    from vqgan_tpu.ops.flash_attention import flash_attention_tpu

    b, n, h, d = 1, 2048, 8, 32  # long-clip head geometry, short N
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, n, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, n, h, d), jnp.bfloat16)
    g = jax.random.normal(ks[3], (b, n, h, d), jnp.bfloat16)

    out_p = np.asarray(jax.jit(flash_attention_tpu)(q, k, v), np.float32)
    out_l = np.asarray(
        jax.jit(lambda *a: chunked_attention(*a, 512))(q, k, v), np.float32
    )
    np.testing.assert_allclose(out_p, out_l, rtol=2e-2, atol=2e-2)  # bf16

    def loss_p(*a):
        return jnp.vdot(flash_attention_tpu(*a).astype(jnp.float32),
                        g.astype(jnp.float32))

    def loss_l(*a):
        return jnp.vdot(chunked_attention(*a, 512).astype(jnp.float32),
                        g.astype(jnp.float32))

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
    gl = jax.jit(jax.grad(loss_l, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(gp, gl):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=5e-2, atol=5e-2,
        )


@requires_tpu
def test_conv3d_ttap_compiled_matches_xla_on_tpu():
    """COMPILED fused-tap conv3d (H-banded halo blocking) vs the direct XLA
    NDHWC conv on the chip — exercises multi-band blocking (H=128 splits),
    temporal clip-edge masks, and both custom-VJP gradients at a real bench
    level shape. CPU interpret parity lives in tests/test_pallas_conv3d.py."""
    from vqgan_tpu.ops.pallas.conv3d import conv3d_ttap

    def direct(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    kx, kk, kg = jax.random.split(jax.random.PRNGKey(42), 3)
    # level-1 bench shape: 128x128 frames force n_hb > 1 banding on chip
    x = jax.random.normal(kx, (1, 4, 128, 128, 64), jnp.bfloat16)
    k = (jax.random.normal(kk, (3, 3, 3, 64, 64), jnp.float32) * 0.05).astype(
        jnp.bfloat16
    )
    dy = jax.random.normal(kg, (1, 4, 128, 128, 64), jnp.bfloat16)

    got = np.asarray(jax.jit(conv3d_ttap)(x, k), np.float32)
    ref = np.asarray(jax.jit(direct)(x, k), np.float32)
    # bf16 inputs; the Pallas kernel accumulates taps in fp32 (tighter than
    # the XLA conv's per-conv rounding) — tolerance covers the format noise
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)

    def loss_p(x_, k_):
        return jnp.vdot(conv3d_ttap(x_, k_).astype(jnp.float32),
                        dy.astype(jnp.float32))

    def loss_r(x_, k_):
        return jnp.vdot(direct(x_, k_).astype(jnp.float32),
                        dy.astype(jnp.float32))

    gx_p, gk_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, k)
    gx_r, gk_r = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p, np.float32),
                               np.asarray(gx_r, np.float32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(gk_p, np.float32),
                               np.asarray(gk_r, np.float32),
                               rtol=3e-2, atol=1e-1)
