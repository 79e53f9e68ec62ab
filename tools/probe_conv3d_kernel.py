"""Compile + parity-check the Pallas fused-tap conv3d on the REAL chip at
the 16f/128px bulk shapes (Ci=Co=64), forward and backward, against the
direct XLA NDHWC conv. Fast (~1 min) gate before paying a full bench_tvae
compile — the im2col fat-K form (round 5) lowers in the isolated probe
(tools/probe_mosaic_geometry.py H); this checks it inside the real kernel
(grid + halos + masks + fp32 accumulator).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from vqgan_tpu.ops.pallas.conv3d import conv3d_ttap

    rng = np.random.RandomState(0)
    shapes = [
        ((1, 4, 128, 128, 64), (3, 3, 3, 64, 64)),
        ((1, 4, 64, 64, 128), (3, 3, 3, 128, 128)),
    ]
    for xs, ks in shapes:
        x = jnp.asarray(rng.randn(*xs), jnp.bfloat16)
        k = jnp.asarray(rng.randn(*ks) * 0.05, jnp.bfloat16)

        def loss_pallas(x, k):
            return jnp.sum(conv3d_ttap(x, k) ** 2)

        def loss_direct(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return jnp.sum(y ** 2)

        t0 = time.time()
        fp = jax.jit(jax.value_and_grad(loss_pallas, argnums=(0, 1)))
        (lp, (dxp, dkp)) = fp(x, k)
        lp = float(lp)
        t1 = time.time()
        (ld, (dxd, dkd)) = jax.jit(
            jax.value_and_grad(loss_direct, argnums=(0, 1))
        )(x, k)
        ld = float(ld)

        rel = abs(lp - ld) / max(abs(ld), 1e-9)
        gxrel = float(
            jnp.max(jnp.abs(dxp.astype(jnp.float32) - dxd.astype(jnp.float32)))
            / (jnp.max(jnp.abs(dxd.astype(jnp.float32))) + 1e-9)
        )
        gkrel = float(
            jnp.max(jnp.abs(dkp.astype(jnp.float32) - dkd.astype(jnp.float32)))
            / (jnp.max(jnp.abs(dkd.astype(jnp.float32))) + 1e-9)
        )
        print(
            f"{xs} loss rel {rel:.2e}  dx relmax {gxrel:.2e}  "
            f"dk relmax {gkrel:.2e}  (pallas compile+run {t1 - t0:.1f}s)"
        )
        assert rel < 5e-2 and gxrel < 5e-2 and gkrel < 5e-2, "PARITY FAIL"
    print("OK")


if __name__ == "__main__":
    main()
