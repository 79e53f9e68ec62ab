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
